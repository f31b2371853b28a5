"""Micro: raycast inner-loop cost in Pallas — per-(tile, block, step) one-hot
row select + lane dynamic_gather over 256 rays, realistic T/K/M.

Grid = T tiles; per tile: fori over K blocks (DMA'd from HBM) x M unrolled
steps. Dummy geometry (index math only) — measures the sampling machinery.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(name, f, *a, n=10):
    out = f(*a)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    for _i in range(n):
        out = f(*a)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1000:.3f} ms", flush=True)


T, K, M, NR = 1200, 8, 8, 256  # tiles, blocks/tile, steps/block, rays
C = 40960


def kern(rows_ref, tw_hbm, out_ref, scratch, sem):
    # rows_ref: (T*K,) int32 block payload rows, scalar-prefetched (SMEM)
    # tw_hbm: (C, 4096) int32 full payload (HBM)
    # out_ref: (1, NR) f32 depth out
    # scratch: (K, 4096) int32 VMEM
    t = pl.program_id(0)
    for k in range(K):
        pltpu.make_async_copy(
            tw_hbm.at[rows_ref[t * K + k]], scratch.at[k], sem.at[k]
        ).start()

    ray_id = jax.lax.broadcasted_iota(jnp.int32, (NR, 1), 0)
    zhit = jnp.full((NR, 1), 1e9, jnp.float32)
    prev_v = jnp.full((NR, 1), 1.0, jnp.float32)
    prev_z = jnp.zeros((NR, 1), jnp.float32)

    for k in range(K):
        pltpu.make_async_copy(
            tw_hbm.at[rows_ref[t * K + k]], scratch.at[k], sem.at[k]
        ).wait()
        blk = scratch[k]
        ts = (blk >> 16).astype(jnp.float32) * (1.0 / 16383.0)
        alloc = (blk & 0xFFFF) > 0
        plane = jnp.where(alloc, ts, 2.0)  # sentinel
        for m in range(M):
            # fake per-sample flat voxel index (stand-in for ray math)
            flat = (ray_id * (k * M + m + 131)) & 4095  # (NR,1)
            row = flat >> 7
            lane = flat & 127
            oh = (
                jax.lax.broadcasted_iota(jnp.int32, (NR, 32), 1) == row
            ).astype(jnp.float32)
            rows_sel = jnp.dot(oh, plane, preferred_element_type=jnp.float32)
            val = jnp.take_along_axis(
                rows_sel, jnp.broadcast_to(lane, (NR, 128)), axis=1
            )[:, :1]
            z = prev_z + 0.01
            crossing = (prev_v > 0) & (val <= 0) & (val > -1.5)
            zc = prev_z + prev_v / jnp.maximum(prev_v - val, 1e-6) * (z - prev_z)
            zhit = jnp.where(crossing & (zc < zhit), zc, zhit)
            prev_v = jnp.where(val < 1.5, val, prev_v)
            prev_z = z
    out_ref[:] = zhit.reshape(1, 1, NR)


def f(rows, tw):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 1, NR), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((K, 32, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((K,)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, 1, NR), jnp.float32),
    )(rows.reshape(-1), tw)


k = jax.random.PRNGKey(0)
tw = jax.jit(lambda k: jax.random.randint(k, (C, 32, 128), -(2**31), 2**31 - 1, jnp.int32))(k)
rows = jax.jit(lambda k: jax.random.randint(k, (T, K), 0, C, jnp.int32))(k)
_ = float(jnp.sum(rows))
ff = jax.jit(f)
try:
    out = ff(rows, tw)
    print("compiled ok, out[0,:3] =", np.asarray(out)[0, :3])
    timeit(f"raymarch inner T={T} K={K} M={M} ({T*K*M*NR/1e6:.0f}M samples)", ff, rows, tw)
except Exception as e:
    print("FAIL:", str(e)[:4000])
