"""Micro: Pallas one-hot-MXU gather — table (R,128) in VMEM, S indices.

out[s] = table.reshape(-1)[idx[s]] via OH(S,R) @ table, then lane select
(take_along_axis variant and masked-reduce variant). idx enters as (S,1)
to dodge Mosaic's unsupported (Sr,128)->(S,1) shape cast.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(name, f, *a, n=20):
    out = f(*a)
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    for _i in range(n):
        out = f(*a)
    _ = float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1000:.3f} ms", flush=True)
    return out


def make_gather(R, S_CHUNK, n_chunks, variant):
    def kern(table_ref, idx_ref, out_ref):
        tbl = table_ref[:]  # (R, 128) f32
        idx = idx_ref[:]  # (S, 1) i32
        S = S_CHUNK
        row = idx >> 7
        lane = idx & 127
        oh = (
            jax.lax.broadcasted_iota(jnp.int32, (S, R), 1) == row
        ).astype(jnp.float32)
        rows = jnp.dot(oh, tbl, preferred_element_type=jnp.float32)  # (S,128)
        if variant == "take":
            sel = jnp.take_along_axis(
                rows, jnp.broadcast_to(lane, (S, 128)), axis=1
            )
            out_ref[:] = sel[:, :1]
        else:
            ohl = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1) == lane
            out_ref[:] = jnp.sum(jnp.where(ohl, rows, 0.0), axis=1, keepdims=True)

    def f(table, idx):
        return pl.pallas_call(
            kern,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((S_CHUNK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (S_CHUNK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n_chunks * S_CHUNK, 1), jnp.float32),
        )(table, idx)

    return jax.jit(f)


k = jax.random.PRNGKey(0)
NS = 12_000_000
for variant in ("take", "reduce"):
    for R, S_CHUNK in [(32, 2048), (320, 2048), (32, 8192)]:
        n_chunks = NS // S_CHUNK
        NT = n_chunks * S_CHUNK
        table = jax.jit(lambda k: jax.random.normal(k, (R, 128), jnp.float32))(k)
        idx = jax.jit(
            lambda k: jax.random.randint(k, (NT, 1), 0, R * 128, jnp.int32)
        )(k)
        _ = float(jnp.sum(idx))
        f = make_gather(R, S_CHUNK, n_chunks, variant)
        try:
            out = f(table, idx)
        except Exception as e:
            print(f"{variant} R={R} chunk={S_CHUNK}: FAIL {str(e)[:160]}")
            continue
        tn = np.asarray(table).reshape(-1)
        inn = np.asarray(idx).reshape(-1)
        on = np.asarray(out).reshape(-1)
        ok = np.allclose(on, tn[inn])
        timeit(
            f"{variant} R={R} chunk={S_CHUNK} ({'OK' if ok else 'WRONG'})",
            f,
            table,
            idx,
        )
