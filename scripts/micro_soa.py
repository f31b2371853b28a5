"""AoS (N,3) vs SoA 3x(N,) march-body arithmetic on TPU."""
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
    jax.random.normal(k, (N, 3), jnp.float32),
    jax.random.uniform(k, (N,), jnp.float32, 0.5, 3.0),
))
tw, vol, DIRS, z = jax.block_until_ready(make(k))
DX, DY, DZ = DIRS[:, 0], DIRS[:, 1], DIRS[:, 2]

@jax.jit
def body_aos(z, tw, vol):
    p = jnp.asarray([0.1, 0.2, 0.3]) + DIRS * z[:, None]
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
    return z + jnp.where(w > 0, jnp.maximum(0.75 * ts * 0.023, 0.0059), 0.047)

@jax.jit
def body_soa(z, tw, vol):
    px = 0.1 + DX * z; py = 0.2 + DY * z; pz = 0.3 + DZ * z
    vx = jnp.floor(px * 170.0).astype(jnp.int32)
    vy = jnp.floor(py * 170.0).astype(jnp.int32)
    vz = jnp.floor(pz * 170.0).astype(jnp.int32)
    bx = vx >> 4; by = vy >> 4; bz = vz >> 4  # floor-div for any sign
    lx = vx - (bx << 4); ly = vy - (by << 4); lz = vz - (bz << 4)
    flat = lx + (ly << 4) + (lz << 8)
    rx = jnp.clip(bx + 32, 0, 63); ry = jnp.clip(by + 32, 0, 63); rz = jnp.clip(bz + 32, 0, 63)
    lin = rx + (ry << 6) + (rz << 12)
    rows = vol[lin]
    val = tw[jnp.clip(rows * 4096 + flat, 0, M - 1)]
    ts = (val >> 16).astype(jnp.float32) / 16383.0
    w = (val & 0xFFFF).astype(jnp.float32)
    return z + jnp.where(w > 0, jnp.maximum(0.75 * ts * 0.023, 0.0059), 0.047)

timeit("body AoS once", body_aos, z, tw, vol)
timeit("body SoA once", body_soa, z, tw, vol)

@jax.jit
def loop_soa(z, tw, vol):
    return jax.lax.fori_loop(0, 40, lambda i, zz: body_soa(zz, tw, vol), z)
timeit("SoA x40 fori", loop_soa, z, tw, vol, n=5)
