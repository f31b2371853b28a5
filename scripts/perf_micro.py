"""Mosaic primitive microbenchmarks on the real chip — the measured roofline
inputs for PERF.md (VERDICT r4 #1: "a wall may only be declared with the
receipts committed").

Each candidate op for the integrate-kernel redesign is timed inside ONE
pallas_call that repeats it ITERS times in a fori_loop with a data
dependency (accumulator folded into the output) so Mosaic cannot hoist or
DCE it. Reported: ns per op instance.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/perf_micro.py
"""

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/o3dtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

ITERS_LO = 1000
ITERS_HI = 9000


def _run_one(body, inputs, out_shape, iters, n_calls, scratch_shapes):
    def kern(*refs):
        out_ref = refs[len(inputs)]
        scr = refs[len(inputs) + 1:]

        def loop(i, acc):
            return acc + body(i, refs[: len(inputs)], scr)

        acc = jax.lax.fori_loop(0, iters, loop, jnp.zeros_like(out_ref[:]))
        out_ref[:] = acc

    f = jax.jit(
        lambda *a: pl.pallas_call(
            kern,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in inputs],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=list(scratch_shapes),
        )(*a)
    )
    out = f(*inputs)
    float(jnp.sum(out.astype(jnp.float32)[0, :1]))
    t0 = time.perf_counter()
    for _ in range(n_calls):
        out = f(*inputs)
    float(jnp.sum(out.astype(jnp.float32)[0, :1]))
    return (time.perf_counter() - t0) / n_calls


def _time_kernel(body, inputs, out_shape, n_calls=5, scratch_shapes=()):
    """ns per op via the slope between two in-kernel repeat counts — the
    ~2.3 ms axon per-dispatch overhead and the fori_loop fixed cost cancel."""
    t_lo = _run_one(body, inputs, out_shape, ITERS_LO, n_calls, scratch_shapes)
    t_hi = _run_one(body, inputs, out_shape, ITERS_HI, n_calls, scratch_shapes)
    return (t_hi - t_lo) / (ITERS_HI - ITERS_LO) * 1e9


def main():
    key = jax.random.PRNGKey(0)
    f32 = jnp.float32
    res = {}

    # -- 1. elementwise op on (2048,1) vs (2048,128) vs (32,128) f32
    x1 = jax.random.normal(key, (2048, 1), f32)
    res["mul (2048,1) f32"] = _time_kernel(
        lambda i, ins, s: ins[0][:] * (1.0 + i), [x1],
        jax.ShapeDtypeStruct((2048, 1), f32))
    x2 = jax.random.normal(key, (2048, 128), f32)
    res["mul (2048,128) f32"] = _time_kernel(
        lambda i, ins, s: ins[0][:] * (1.0 + i), [x2],
        jax.ShapeDtypeStruct((2048, 128), f32))
    x3 = jax.random.normal(key, (32, 128), f32)
    res["mul (32,128) f32"] = _time_kernel(
        lambda i, ins, s: ins[0][:] * (1.0 + i), [x3],
        jax.ShapeDtypeStruct((32, 128), f32))

    # -- 2. lane dynamic_gather: take_along_axis (2048,128) axis=1
    idx = jax.random.randint(key, (2048, 128), 0, 128, jnp.int32)
    res["take_along_axis (2048,128)"] = _time_kernel(
        lambda i, ins, s: jnp.take_along_axis(
            ins[0][:] + i.astype(f32), ins[1][:], axis=1),
        [x2, idx], jax.ShapeDtypeStruct((2048, 128), f32))

    # take_along_axis producing only col 0 used (as in current kernel)
    idx1 = jax.random.randint(key, (2048, 1), 0, 128, jnp.int32)
    res["take_along 1col (2048,128)"] = _time_kernel(
        lambda i, ins, s: jnp.take_along_axis(
            ins[0][:] + i.astype(f32),
            jnp.broadcast_to(ins[1][:], (2048, 128)), axis=1)[:, :1],
        [x2, idx1], jax.ShapeDtypeStruct((2048, 1), f32))

    # -- 3. mask-mult + lane reduce (2048,128) -> (2048,1)
    res["maskmul+lanereduce (2048,128)"] = _time_kernel(
        lambda i, ins, s: jnp.sum(
            (ins[0][:] + i.astype(f32))
            * (jax.lax.broadcasted_iota(jnp.int32, (2048, 128), 1)
               == ins[1][:]).astype(f32),
            axis=1, keepdims=True),
        [x2, idx1], jax.ShapeDtypeStruct((2048, 1), f32))

    # -- 4. segment reduce (2048,640)->(2048,5) via 5 sliced lane reduces
    x640 = jax.random.normal(key, (2048, 640), f32)
    res["segreduce 5x(2048,128)->(2048,5)"] = _time_kernel(
        lambda i, ins, s: jnp.concatenate(
            [jnp.sum(ins[0][:, p * 128:(p + 1) * 128] + i.astype(f32),
                     axis=1, keepdims=True) for p in range(5)], axis=1),
        [x640], jax.ShapeDtypeStruct((2048, 5), f32))

    # -- 5. reshape (2048,1) -> (16,128)
    res["reshape (2048,1)->(16,128)"] = _time_kernel(
        lambda i, ins, s: (ins[0][:] + i.astype(f32)).reshape(16, 128),
        [x1], jax.ShapeDtypeStruct((16, 128), f32))

    # reshape (2048,128)->(16,128,128) + sublane reduce axis=1
    res["reshape3d+subreduce (2048,128)"] = _time_kernel(
        lambda i, ins, s: jnp.sum(
            (ins[0][:] + i.astype(f32)).reshape(16, 128, 128), axis=1),
        [x2], jax.ShapeDtypeStruct((16, 128), f32))

    # -- 6. one-hot build (2048,128) from (2048,1)
    res["onehot build (2048,128) bf16"] = _time_kernel(
        lambda i, ins, s: (
            jax.lax.broadcasted_iota(jnp.int32, (2048, 128), 1)
            == (ins[0][:] + i)).astype(jnp.bfloat16),
        [idx1], jax.ShapeDtypeStruct((2048, 128), jnp.bfloat16))

    # -- 7. matmuls
    ab = jax.random.normal(key, (2048, 128), f32).astype(jnp.bfloat16)
    slab = jax.random.normal(key, (128, 640), f32).astype(jnp.bfloat16)
    res["matmul bf16 (2048,128)@(128,640)"] = _time_kernel(
        lambda i, ins, s: jax.lax.dot_general(
            ins[0][:] + i.astype(jnp.bfloat16), ins[1][:],
            (((1,), (0,)), ((), ())), preferred_element_type=f32),
        [ab, slab], jax.ShapeDtypeStruct((2048, 640), f32))

    A = jax.random.normal(key, (16, 2048), f32)
    V = jax.random.normal(key, (2048, 640), f32)
    res["matmul f32 (16,2048)@(2048,640)"] = _time_kernel(
        lambda i, ins, s: jax.lax.dot_general(
            ins[0][:] + i.astype(f32), ins[1][:],
            (((1,), (0,)), ((), ())), preferred_element_type=f32),
        [A, V], jax.ShapeDtypeStruct((16, 640), f32))

    ohu = jax.random.normal(key, (2048, 128), f32).astype(jnp.bfloat16)
    slabT = jax.random.normal(key, (128, 128), f32).astype(jnp.bfloat16)
    res["matmul bf16 (2048,128)@(128,128)"] = _time_kernel(
        lambda i, ins, s: jax.lax.dot_general(
            ins[0][:] + i.astype(jnp.bfloat16), ins[1][:],
            (((1,), (0,)), ((), ())), preferred_element_type=f32),
        [ohu, slabT], jax.ShapeDtypeStruct((2048, 128), f32))

    # small relayout matmul f32: (16,2048)@(2048,128)
    q = jax.random.normal(key, (2048, 128), f32)
    res["matmul f32 (16,2048)@(2048,128)"] = _time_kernel(
        lambda i, ins, s: jax.lax.dot_general(
            ins[0][:] + i.astype(f32), ins[1][:],
            (((1,), (0,)), ((), ())), preferred_element_type=f32),
        [A, q], jax.ShapeDtypeStruct((16, 128), f32))

    # -- 8. transpose (128,2048) -> (2048,128)
    w = jax.random.normal(key, (128, 2048), f32)
    res["transpose (128,2048)"] = _time_kernel(
        lambda i, ins, s: jnp.transpose(ins[0][:] + i.astype(f32)),
        [w], jax.ShapeDtypeStruct((2048, 128), f32))
    w8 = jax.random.normal(key, (2048, 8), f32)
    res["transpose (2048,8)"] = _time_kernel(
        lambda i, ins, s: jnp.transpose(ins[0][:] + i.astype(f32)),
        [w8], jax.ShapeDtypeStruct((8, 2048), f32))

    # -- 9. lane broadcast relayout: (32,128) -> (32,128,128) bcast last
    res["bcast lane->sub (32,128)->(32,128,128)"] = _time_kernel(
        lambda i, ins, s: jnp.broadcast_to(
            (ins[0][:] + i.astype(f32))[:, :, None], (32, 128, 128)) * 1.0,
        [x3], jax.ShapeDtypeStruct((32, 128, 128), f32))

    for k, v in res.items():
        print(f"{k:42s} {v:9.1f} ns")


if __name__ == "__main__":
    main()
