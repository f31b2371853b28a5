"""Micro: cost of one march iteration's pieces on TPU (on-device data)."""
import time
import jax, jax.numpy as jnp

def timeit(name, f, *a, n=20):
    out = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(f(*a))
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.3f} ms", flush=True)
    return out

N = 307200
M = 168 * 1024 * 1024
k = jax.random.PRNGKey(0)
make = jax.jit(lambda k: (
    jax.random.randint(k, (M,), -2**31, 2**31 - 1, jnp.int32),
    jax.random.randint(k, (N,), 0, M, jnp.int32),
    jax.random.randint(k, (N,), 0, 64**3, jnp.int32),
    jax.random.randint(k, (64**3,), 0, 40960, jnp.int32),
    jax.random.normal(k, (N, 3), jnp.float32),
    jax.random.uniform(k, (N,), jnp.float32, 0.5, 3.0),
))
tw, idx, rows_small, vol, DIRS, z = jax.block_until_ready(make(k))
ORIG = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)

timeit("gather 307k from 168M", jax.jit(lambda tw, i: tw[i]), tw, idx)
timeit("gather 307k from 1M vol", jax.jit(lambda v, i: v[i]), vol, rows_small)

@jax.jit
def body(z, tw, vol):
    p = ORIG + DIRS * z[:, None]
    voxel = jnp.floor(p * 170.0).astype(jnp.int32)
    block = jnp.floor_divide(voxel, 16)
    local = voxel - block * 16
    flat = local[..., 0] + local[..., 1] * 16 + local[..., 2] * 256
    rel = jnp.clip(block + 32, 0, 63)
    lin = rel[..., 0] + rel[..., 1] * 64 + rel[..., 2] * 4096
    rows = vol[lin]
    val = tw[jnp.clip(rows * 4096 + flat, 0, M - 1)]
    ts = (val >> 16).astype(jnp.float32) / 16383.0
    w = (val & 0xFFFF).astype(jnp.float32)
    step = jnp.where(w > 0, jnp.maximum(0.75 * ts * 0.023, 0.0059), 0.047)
    return z + step

timeit("march body once", body, z, tw, vol)

@jax.jit
def loop(z, tw, vol):
    return jax.lax.fori_loop(0, 40, lambda i, zz: body(zz, tw, vol), z)
timeit("march body x40 fori", loop, z, tw, vol, n=5)

# chunked: 16k rays at a time
@jax.jit
def loop_chunked(z, tw, vol):
    def per(zc):
        return jax.lax.fori_loop(0, 40, lambda i, zz: body_c(zz, tw, vol), zc)
    def body_c(zz, tw, vol):
        return zz + 0.01  # placeholder; chunking cost only
    return jax.lax.map(per, z.reshape(-1, 16384))
