"""Micro: cost of one march iteration's pieces on TPU."""
import time
import jax, jax.numpy as jnp
import numpy as np

def timeit(name, f, *a, n=20):
    out = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(f(*a))
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.3f} ms", flush=True)
    return out

N = 307200
M = 168 * 1024 * 1024  # tw buffer elements
rng = np.random.default_rng(0)
tw = jnp.asarray(rng.integers(-2**31, 2**31, M, dtype=np.int64).astype(np.int32))
idx = jnp.asarray(rng.integers(0, M, N).astype(np.int32))
rows_small = jnp.asarray(rng.integers(0, 64**3, N).astype(np.int32))
vol = jnp.asarray(rng.integers(0, 40960, 64**3).astype(np.int32))

timeit("gather 307k from 168M", jax.jit(lambda tw, i: tw[i]), tw, idx)
timeit("gather 307k from 1M vol", jax.jit(lambda v, i: v[i]), vol, rows_small)

# a full march-like body: index math + 2 gathers + where soup
ORIG = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
DIRS = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
z = jnp.asarray(rng.uniform(0.5, 3.0, N).astype(np.float32))

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

# 40 iterations in a fori_loop
@jax.jit
def loop(z, tw, vol):
    return jax.lax.fori_loop(0, 40, lambda i, zz: body(zz, tw, vol), z)
timeit("march body x40 fori", loop, z, tw, vol, n=5)
