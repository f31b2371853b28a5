"""Micro: XLA-TPU gather cost vs operand layout — drives the raycast design.

Variants measured for ~10M random samples from the (C+1, 4096)-int32 TSDF
payload (671 MB):
  a) scalar gather from flat 1-D view               (round-2 march path)
  b) row gather (minor dim 128) + one-hot lane select
  c) row gather (minor dim 128) + take_along_axis
  d) row gather minor dim 8 / 16 / 32
  e) scalar gather from the small 1 MB dense index
"""
import time

import jax
import jax.numpy as jnp


def timeit(name, f, *a, n=10):
    out = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(f(*a))
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1000:.3f} ms", flush=True)
    return out


S = 32  # samples per ray
N = 307200
NS = N * S  # ~9.8M samples
M = 168 * 1024 * 1024  # elements in payload (671 MB int32)

k = jax.random.PRNGKey(0)
make = jax.jit(
    lambda k: (
        jax.random.randint(k, (M,), -(2**31), 2**31 - 1, jnp.int32),
        jax.random.randint(k, (NS,), 0, M, jnp.int32),
        jax.random.randint(k, (64**3,), 0, 40960, jnp.int32),
    )
)
tw, idx, vol = jax.block_until_ready(make(k))

print(f"samples: {NS/1e6:.1f}M", flush=True)

timeit("a) scalar gather flat", jax.jit(lambda t, i: t[i]), tw, idx)

for lanes in (128, 32, 16, 8):
    t2 = tw.reshape(-1, lanes)
    row = idx // lanes
    lane = idx % lanes

    def row_take(t, r, l, lanes=lanes):
        rows = t[r]  # (NS, lanes)
        return jnp.take_along_axis(rows, l[:, None], axis=1)[:, 0]

    def row_onehot(t, r, l, lanes=lanes):
        rows = t[r]
        oh = (jnp.arange(lanes, dtype=jnp.int32)[None, :] == l[:, None])
        return jnp.sum(jnp.where(oh, rows, 0), axis=1)

    timeit(f"b) row{lanes} gather only", jax.jit(lambda t, r: t[r]), t2, row)
    timeit(f"c) row{lanes} + take_along", jax.jit(row_take), t2, row, lane)
    timeit(f"d) row{lanes} + onehot sum", jax.jit(row_onehot), t2, row, lane)

idx_small = idx % (64**3)
timeit("e) scalar gather from 1MB", jax.jit(lambda v, i: v[i]), vol, idx_small)
timeit(
    "f) 2d gather idx pair",
    jax.jit(lambda t, r, l: t[r, l]),
    tw.reshape(-1, 128),
    idx // 128,
    idx % 128,
)
