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
    jax.random.randint(k, (M,), -2**31, 2**31-1, jnp.int32),
    jax.random.randint(k, (64**3,), 0, 40960, jnp.int32),
    jax.random.uniform(k, (N,), jnp.float32, 0.5, 3.0),
    jax.random.randint(k, (N,), 0, 64**3, jnp.int32),
    jax.random.randint(k, (N,), 0, 4096, jnp.int32),
))
tw, vol, z, lin0, flat0 = jax.block_until_ready(make(k))

timeit("elementwise only", jax.jit(lambda z: jnp.floor(z * 170.0).astype(jnp.int32) + 3), z)
timeit("1 gather raw idx", jax.jit(lambda v, i: v[i]), vol, lin0)
timeit("1 gather computed idx", jax.jit(lambda v, i: v[jnp.clip(i + 1, 0, 64**3 - 1)]), vol, lin0)
timeit("2 chained gathers", jax.jit(lambda tw, v, i, f: tw[jnp.clip(v[i] * 4096 + f, 0, M - 1)]), tw, vol, lin0, flat0)
timeit("gather + shifts", jax.jit(lambda tw, i: ((tw[i] >> 16).astype(jnp.float32), (tw[i] & 0xFFFF).astype(jnp.float32))), tw, lin0)

# full body minus gathers
@jax.jit
def nogather(z):
    px = 0.1 + 1.1 * z; py = 0.2 + 0.9 * z; pz = 0.3 + 0.7 * z
    vx = jnp.floor(px * 170.0).astype(jnp.int32)
    vy = jnp.floor(py * 170.0).astype(jnp.int32)
    vz = jnp.floor(pz * 170.0).astype(jnp.int32)
    bx = vx >> 4; by = vy >> 4; bz = vz >> 4
    flat = (vx - (bx << 4)) + ((vy - (by << 4)) << 4) + ((vz - (bz << 4)) << 8)
    lin = jnp.clip(bx + 32, 0, 63) + (jnp.clip(by + 32, 0, 63) << 6) + (jnp.clip(bz + 32, 0, 63) << 12)
    return lin + flat
timeit("body math no gathers", nogather, z)
