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
k = jax.random.PRNGKey(0)

def body(dx, z, tw, vol, M):
    px = 0.1 + dx * z
    vx = jnp.floor(px * 170.0).astype(jnp.int32)
    lin = jnp.clip(vx & 0x3FFFF, 0, 64**3 - 1)
    rows = vol[lin]
    val = tw[jnp.clip(rows * 4096 + lin, 0, M - 1)]
    w = (val & 0xFFFF).astype(jnp.float32)
    return z + jnp.where(w > 0, 0.01, 0.047)

for MB in (17, 67, 670):
    M = MB * 1024 * 1024 // 4
    make = jax.jit(lambda k: (
        jax.random.randint(k, (M,), -2**31, 2**31-1, jnp.int32),
        jax.random.randint(k, (64**3,), 0, 40960, jnp.int32),
        jax.random.normal(k, (N,), jnp.float32),
        jax.random.uniform(k, (N,), jnp.float32, 0.5, 3.0),
    ))
    tw, vol, DX, z = jax.block_until_ready(make(k))
    loop = jax.jit(lambda dx, z, tw, vol: jax.lax.fori_loop(
        0, 40, lambda i, zz: body(dx, zz, tw, vol, M), z))
    timeit(f"x40 fori tw={MB}MB", loop, DX, z, tw, vol)
    unrolled = jax.jit(lambda dx, z, tw, vol: [z := body(dx, z, tw, vol, M) for _ in range(40)][-1])
    timeit(f"x40 unrolled tw={MB}MB", unrolled, DX, z, tw, vol)
