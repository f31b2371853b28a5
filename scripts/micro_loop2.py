import time
import jax, jax.numpy as jnp

def timeit(name, f, *a, n=5):
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
    jax.random.randint(k, (M,), -2**31, 2**31-1, jnp.int32),
    jax.random.randint(k, (64**3,), 0, 40960, jnp.int32),
    jax.random.normal(k, (N,), jnp.float32),
    jax.random.uniform(k, (N,), jnp.float32, 0.5, 3.0),
))
tw, vol, DX, z = jax.block_until_ready(make(k))

def mk(variant):
    def body(dx, zz, tw, vol):
        px = 0.1 + dx * zz; py = 0.2 + 0.9 * zz; pz = 0.3 + 0.7 * zz
        vx = jnp.floor(px * 170.0).astype(jnp.int32)
        vy = jnp.floor(py * 170.0).astype(jnp.int32)
        vz = jnp.floor(pz * 170.0).astype(jnp.int32)
        bx = vx >> 4; by = vy >> 4; bz = vz >> 4
        flat = (vx - (bx << 4)) + ((vy - (by << 4)) << 4) + ((vz - (bz << 4)) << 8)
        lin = jnp.clip(bx + 32, 0, 63) + (jnp.clip(by + 32, 0, 63) << 6) + (jnp.clip(bz + 32, 0, 63) << 12)
        rows = vol[lin]
        val = tw[jnp.clip(rows * 4096 + flat, 0, M - 1)]
        ts = (val >> 16).astype(jnp.float32) / 16383.0
        w = (val & 0xFFFF).astype(jnp.float32)
        if variant == "dep_step":
            return zz + jnp.where(w > 0, jnp.maximum(0.75 * ts * 0.023, 0.0059), 0.047)
        else:
            return zz + jnp.where(w > 0, 0.01, 0.047)
    return jax.jit(lambda dx, z, tw, vol: jax.lax.fori_loop(
        0, 40, lambda i, zz: body(dx, zz, tw, vol), z))

timeit("x40 const_step (full 3-coord body)", mk("const"), DX, z, tw, vol)
timeit("x40 dep_step (ts-dependent step)", mk("dep_step"), DX, z, tw, vol)
