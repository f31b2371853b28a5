"""Per-stage roofline profile of the TSDF integrate frame step (VERDICT r4 #1).

Times each stage of the integrate path separately on the real chip with
honest device->host drains, at the bench workload (640x480, voxel 3/512,
frame_block_capacity 2048). Output feeds PERF.md.

Run: python scripts/perf_integrate.py
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/o3dtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def drain(out):
    leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")]
    acc = 0.0
    for l in leaves[:2]:
        x = l
        while x.ndim > 1:
            x = x[0]
        if x.ndim:
            x = x[:1]
        acc += float(jnp.sum(x.astype(jnp.float32)))
    return acc


def timed(fn, args, n=20, warm=2):
    for _ in range(warm):
        out = fn(*args)
    drain(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    drain(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    from functools import partial

    from open3d_tpu.core import hashmap as hm
    from open3d_tpu.data import synthetic
    from open3d_tpu.geometry import voxel_block_grid as vbg_mod
    from open3d_tpu.geometry.camera import PinholeCameraIntrinsic
    from open3d_tpu.ops.pallas import integrate as pint

    intr = PinholeCameraIntrinsic(640, 480, 525.0, 525.0, 319.5, 239.5)
    depths, colors, extrinsics, _ = synthetic.render_sequence(
        8, intrinsic=intr, span=0.8
    )
    FBC = 2048

    def make():
        return vbg_mod.create(
            voxel_size=3.0 / 512, block_resolution=16, block_count=40960,
            with_color=True,
        )

    # build a grid with a few frames integrated (so activate is warm/steady)
    @partial(jax.jit, donate_argnums=(0,))
    def step(vbg, depth, color, extrinsic):
        keys, _ = vbg_mod.compute_unique_block_coordinates(
            vbg, depth, intr, extrinsic, depth_max=3.0, frame_block_capacity=FBC
        )
        return vbg_mod.integrate(vbg, keys, depth, color, intr, extrinsic, depth_max=3.0)

    vbg = make()
    for i in range(8):
        vbg = step(vbg, depths[i], colors[i], extrinsics[i])
    drain(vbg.tw)
    d0, c0, E0 = depths[0], colors[0], extrinsics[0]

    # full step (donating: chain the grid through)
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        vbg = step(vbg, d0, c0, E0)
    drain(vbg.tw)
    t_full = (time.perf_counter() - t0) / n * 1e3

    # stage 1: touch
    touch = jax.jit(
        lambda v, d, E: vbg_mod.compute_unique_block_coordinates(
            v, d, intr, E, depth_max=3.0, frame_block_capacity=FBC
        )
    )
    t_touch = timed(touch, (vbg, d0, E0))
    keys, cnt = touch(vbg, d0, E0)
    print(f"touched blocks this frame: {int(cnt)}")

    # stage 2: activate
    act = jax.jit(lambda v, k: hm.activate(v.table, k))
    t_act = timed(act, (vbg, keys))
    table, slot, ok = act(vbg, keys)
    rows = jnp.where(ok, slot, vbg.capacity)

    # stage 3: slab fit + planes prep
    coords = hm.unpack_coords(keys)

    def prep(d, c, E, coords):
        from open3d_tpu.ops.pallas import integrate2 as pint2

        v0, u0, shift, fit = pint.block_slab_fit(coords, intr, E, vbg.voxel_size)
        planes = pint2.prepare_planes_v2(d, c, True, 3.0)
        return v0, u0, shift, fit, planes

    prepj = jax.jit(prep)
    t_prep = timed(prepj, (d0, c0, E0, coords))
    v0, u0, shift, fit, planes = prepj(d0, c0, E0, coords)
    print(f"fit blocks: {int(jnp.sum((fit == 1) & (rows < vbg.capacity)))} "
          f"unfit(fallback): {int(jnp.sum((fit == 0) & (rows < vbg.capacity) & ((keys[:,0]!=0)|(keys[:,1]!=0))))}")

    # stage 4: pallas kernel alone (v2)
    from open3d_tpu.ops.pallas import integrate2 as pint2

    def kern(tw, color, rows, coords, v0, u0, shift, fit, planes, E):
        return pint2.integrate_blocks_v2(
            tw, color, rows, coords, v0, u0, shift, fit, planes, intr, E,
            vbg.voxel_size, vbg.sdf_trunc, 3.0,
        )

    kj = jax.jit(kern, donate_argnums=(0, 1))
    args = lambda: (vbg.tw + 0, vbg.color + 0, rows, coords, v0, u0, shift, fit, planes, E0)
    # manual timing loop (donation)
    out = kj(*args())
    drain(out)
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        out = kj(*args())
    drain(out)
    t_kern_incl_copy = (time.perf_counter() - t0) / n * 1e3
    # measure the +0 copies alone
    cp = jax.jit(lambda tw, c: (tw + 0, c + 0))
    t_copy = timed(cp, (vbg.tw, vbg.color))
    t_kern = t_kern_incl_copy - t_copy

    # stage 5: fallback path cost — integrate with fallback_capacity=0 vs 48
    def full_int(vbg_tw, vbg_color, table, d, c, E, fbcap):
        v2 = vbg.__class__(**{**vbg.__dict__, "tw": vbg_tw, "color": vbg_color, "table": table})
        return vbg_mod.integrate(v2, keys, d, c, intr, E, depth_max=3.0,
                                 fallback_capacity=fbcap)

    import dataclasses
    def full_int2(tw, color, d, c, E, fbcap):
        v2 = dataclasses.replace(vbg, tw=tw, color=color)
        return vbg_mod.integrate(v2, keys, d, c, intr, E, depth_max=3.0,
                                 fallback_capacity=fbcap)

    for fbcap in (48, 0):
        fj = jax.jit(partial(full_int2, fbcap=fbcap), donate_argnums=(0, 1))
        out = fj(vbg.tw + 0, vbg.color + 0, d0, c0, E0)
        drain(out.tw)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fj(vbg.tw + 0, vbg.color + 0, d0, c0, E0)
        drain(out.tw)
        t_i = (time.perf_counter() - t0) / n * 1e3 - t_copy
        print(f"integrate(fallback_capacity={fbcap}): {t_i:.2f} ms")

    print(f"\nfull step        : {t_full:.2f} ms  ({1000/t_full:.1f} fps)")
    print(f"touch            : {t_touch:.2f} ms")
    print(f"activate         : {t_act:.2f} ms")
    print(f"slabfit+planes   : {t_prep:.2f} ms")
    print(f"pallas kernel    : {t_kern:.2f} ms   (buf copy overhead {t_copy:.2f} ms subtracted)")


if __name__ == "__main__":
    main()
