"""Benchmarks for the BASELINE.json configs, honestly synchronized.

Headline: TSDF VoxelBlockGrid integration throughput (frames/second) at the
reference workload — 640x480, voxel 3/512 m, 16^3 blocks (the reference's
native CUDA kernels reach ~100 Hz on a GTX 1070,
docs/tutorial/t_reconstruction_system/integration.rst:43). vs_baseline =
fps / 100.

extra carries the round-3 secondary metrics:
  raycast_fps          full 640x480 Pallas tile-march raycast (target 30)
  slam_fps             full dense-SLAM step: track + integrate + raycast
  icp_iters_per_s      multi-scale ICP at the reference harness config
                       (voxel 0.02, dmax 0.05 — benchmarks/t/pipelines/
                       registration/Registration.cpp:16-42)
  odometry_fps         RGBD hybrid odometry frame pairs / s
  fpfh_ransac_s        FPFH + RANSAC global registration wall-clock
  *_ms                 per-stage breakdown

SYNC NOTE: on the axon TPU tunnel `block_until_ready` can return before
execution finishes (round-2's 1873 fps integration number was dispatch
rate, not compute — measured honestly it was ~8 fps). Every timing below
drains the pipe by pulling a scalar reduction of the result to the host.

WHERE THE INTEGRATION TIME GOES (round-4 ablations, v5e): the fused
Pallas kernel is op-count-bound, not flop- or bandwidth-bound. Per
touched block (~600/frame): ~11 us of lane dynamic_gathers (the
hardware's scattered-read path — one (2048, 128) gather per plane per
chunk; bf16 gather inputs are unsupported, m-batched selects measured
SLOWER), ~10-15 us building the exact bf16 relayout operands, ~4 us of
one-hot MXU sampling matmuls, ~5 us projection math, ~4 us grid-step
fixed cost. A GTX 1070 reaches ~100 Hz because its per-thread scattered
reads run at full memory parallelism — the structural gap this design
pays for with one-hot matmul + gather machinery. Round 2 -> 4 moved the
honest number 8 -> ~32 fps; the remaining 3x to the 1.5x-of-reference
target needs either a Mosaic-level scattered-read primitive or a
different data layout, not more op shaving.
"""

import json
import time

import jax
import jax.numpy as jnp

# persistent compile cache: TPU compiles go through the axon AOT tunnel
# (~20-40 s each); warm runs skip them entirely
jax.config.update("jax_compilation_cache_dir", "/tmp/o3dtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

BASELINE_FPS = 100.0  # reference CUDA kernels, GTX 1070
RAYCAST_TARGET_FPS = 30.0


def _drain(out):
    """Force full device-side completion (device->host scalar pull)."""
    leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")]
    acc = 0.0
    for l in leaves[:2]:
        x = l
        while x.ndim > 1:
            x = x[0]
        acc += float(jnp.sum(x[..., :1].astype(jnp.float32)))
    return acc


def timed_loop(fn, args_list, n_reps=3):
    """Wall-clock per call over n_reps passes of args_list, honest sync."""
    out = fn(*args_list[0])
    _drain(out)
    t0 = time.perf_counter()
    for _ in range(n_reps):
        for a in args_list:
            out = fn(*a)
    _drain(out)
    return (time.perf_counter() - t0) / (n_reps * len(args_list))


def bench_integration(intrinsic, depths, colors, extrinsics, small=False):
    from functools import partial

    from open3d_tpu.geometry import voxel_block_grid as vbg_mod

    n_frames = depths.shape[0]
    FBC = 256 if small else 2048

    @partial(jax.jit, donate_argnums=(0,))
    def step(vbg, depth, color, extrinsic):
        keys, _ = vbg_mod.compute_unique_block_coordinates(
            vbg, depth, intrinsic, extrinsic, depth_max=3.0, frame_block_capacity=FBC
        )
        return vbg_mod.integrate(
            vbg, keys, depth, color, intrinsic, extrinsic, depth_max=3.0
        )

    def make():
        return vbg_mod.create(
            voxel_size=3.0 / 512 if not small else 0.02,
            block_resolution=16,
            block_count=2048 if small else 40960,
            with_color=True,
        )

    vbg = make()
    vbg = step(vbg, depths[0], colors[0], extrinsics[0])
    _drain(vbg.tw)
    n_reps = 3
    t0 = time.perf_counter()
    for _ in range(n_reps):
        for i in range(n_frames):
            vbg = step(vbg, depths[i], colors[i], extrinsics[i])
    _drain(vbg.tw)
    dt = (time.perf_counter() - t0) / (n_reps * n_frames)
    return 1.0 / dt, vbg


def bench_raycast(vbg, intrinsic, extrinsic, gt_depth=None):
    """Returns (fps, accuracy dict): speed must not silently buy holes, so
    the benchmark also reports median |raycast - GT| and the in-range miss
    fraction against the synthetic ground-truth depth (VERDICT r3 item 2)."""
    import numpy as np

    from open3d_tpu.geometry import voxel_block_grid as vbg_mod

    f = jax.jit(
        lambda v, E: vbg_mod.raycast(
            v, intrinsic, E, depth_min=0.1, depth_max=3.0, with_color=False
        ).depth
    )
    dt = timed_loop(f, [(vbg, extrinsic)], n_reps=8)
    acc = {}
    if gt_depth is not None:
        dn = np.asarray(f(vbg, extrinsic))
        dt_np = np.asarray(gt_depth)
        in_range = (dt_np > 0) & (dt_np < 2.9)
        both = (dn > 0) & in_range
        err = np.abs(dn - dt_np)[both]
        acc = {
            "raycast_median_err_mm": round(float(np.median(err)) * 1000, 2),
            "raycast_miss_in_range": round(
                float(((dn == 0) & in_range).mean()), 4
            ),
        }
    return 1.0 / dt, acc


def bench_slam(intrinsic, depths, colors, small=False, stride=1):
    """stride > 1 renders the TRACKING model frame at reduced resolution
    (model_raycast_stride; ATE-gated by test_slam_half_res_model_raycast) —
    reported as a separate metric, the default config stays reference-
    faithful full-res."""
    from functools import partial

    from open3d_tpu.models import dense_slam

    if small:
        cfg = dense_slam.SLAMConfig(
            voxel_size=0.02, block_count=2048, frame_block_capacity=256,
            model_raycast_stride=stride,
        )
    else:
        cfg = dense_slam.SLAMConfig(
            block_count=40960, frame_block_capacity=2048,
            model_raycast_stride=stride,
        )
    model = dense_slam.create_model(cfg)

    @partial(jax.jit, donate_argnums=(0,))
    def step(model, depth, color, model_depth):
        return dense_slam.slam_step(model, depth, color, model_depth, intrinsic)

    H, W = depths[0].shape
    md = jnp.zeros((H // stride, W // stride), depths.dtype)
    res = step(model, depths[0], colors[0], md)
    model, md = res.model, res.raycast_depth
    _drain(md)
    n = depths.shape[0]
    t0 = time.perf_counter()
    for rep in range(2):
        for i in range(n):
            res = step(model, depths[i], colors[i], md)
            model, md = res.model, res.raycast_depth
    _drain(md)
    return (2 * n) / (time.perf_counter() - t0)


def bench_icp(key, small=False):
    """Reference harness config: voxel 0.02 downsample, dmax 0.05, 10 iters
    (cpp/benchmarks/t/pipelines/registration/Registration.cpp:16-42)."""
    from open3d_tpu.data import synthetic
    from open3d_tpu.geometry.camera import PinholeCameraIntrinsic
    from open3d_tpu.geometry.rgbd import pointcloud_from_depth
    from open3d_tpu.ops import pointcloud as pc_ops
    from open3d_tpu.pipelines import registration as reg

    if small:
        intr = PinholeCameraIntrinsic(160, 120, 131.25, 131.25, 79.5, 59.5)
    else:
        intr = PinholeCameraIntrinsic(640, 480, 525.0, 525.0, 319.5, 239.5)
    depths, _, extr, _ = synthetic.render_sequence(2, intrinsic=intr, span=0.15)
    clouds = []
    # fixed-capacity shapes drive the compute: shrink the downsampled
    # clouds to a realistic capacity or ICP pays full 307k-row NNS
    cap = 2048 if small else 40960
    for i in range(2):
        pcd = pointcloud_from_depth(depths[i], intr, extr[i])
        down = pc_ops.voxel_down_sample(pcd, 0.02, capacity=cap)
        clouds.append(pc_ops.estimate_normals(down, max_nn=30))
    N_ITER = 10
    f = jax.jit(
        lambda s, t: reg.icp(
            s,
            t,
            0.05,
            estimation=reg.TransformationEstimationPointToPlane(),
            criteria=reg.ICPConvergenceCriteria(
                max_iteration=N_ITER, relative_fitness=0.0, relative_rmse=0.0
            ),
        ).transformation
    )
    dt = timed_loop(f, [(clouds[0], clouds[1])], n_reps=3)

    # per-stage breakdown (VERDICT r4 item 5), amortized inside fori_loops of
    # N_ITER so the ~1 ms/dispatch tunnel latency divides out
    from open3d_tpu.core import nns

    est = reg.TransformationEstimationPointToPlane()
    src, tgt = clouds
    b = nns.banded_build(
        tgt.positions, tgt.mask, est.corr_extras(tgt), window=2048
    )
    qkey = jnp.where(src.mask, nns.banded_query_key(b, src.positions), 3e38)
    qs = src.positions[jnp.argsort(qkey)]
    qm = src.mask[jnp.argsort(qkey)]

    def loop_nn(qq):
        def body(i, acc):
            _, d2, _, _ = nns.banded_one_nn(b, qq + acc * 1e-12, 0.05, qmask=qm)
            return acc + jnp.sum(d2)

        return jax.lax.fori_loop(0, N_ITER, body, 0.0)

    def loop_nn_est(qq):
        def body(i, acc):
            idx, d2, sel, _ = nns.banded_one_nn(
                b, qq + acc * 1e-12, 0.05, qmask=qm
            )
            up = est.compute(qq, {}, tgt, idx, qm & (idx >= 0), None, corr_rows=sel)
            return acc + up[0, 3]

        return jax.lax.fori_loop(0, N_ITER, body, 0.0)

    t_nn = timed_loop(jax.jit(loop_nn), [(qs,)], n_reps=3) / N_ITER
    t_nn_est = timed_loop(jax.jit(loop_nn_est), [(qs,)], n_reps=3) / N_ITER
    _, _, _, short = jax.jit(lambda q: nns.banded_one_nn(b, q, 0.05, qmask=qm))(qs)
    breakdown = {
        "icp_nn_ms": round(t_nn * 1e3, 3),
        "icp_estimation_ms": round(max(t_nn_est - t_nn, 0.0) * 1e3, 3),
        "icp_other_ms": round(max(dt / N_ITER - t_nn_est, 0.0) * 1e3, 3),
        "icp_band_shortfall": int(short),
    }
    return N_ITER / dt, breakdown


def bench_odometry(intrinsic, depths, colors):
    from open3d_tpu.geometry.rgbd import RGBDImage
    from open3d_tpu.pipelines import odometry as odo

    f = jax.jit(
        lambda d0, c0, d1, c1: odo.rgbd_odometry_multi_scale(
            RGBDImage(color=c0, depth=d0),
            RGBDImage(color=c1, depth=d1),
            intrinsic,
            method=odo.HYBRID,
        ).transformation
    )
    dt = timed_loop(f, [(depths[0], colors[0], depths[1], colors[1])], n_reps=5)
    return 1.0 / dt


def bench_fpfh_ransac(key, small=False):
    from open3d_tpu.data import synthetic
    from open3d_tpu.geometry.camera import PinholeCameraIntrinsic
    from open3d_tpu.geometry.rgbd import pointcloud_from_depth
    from open3d_tpu.ops import pointcloud as pc_ops
    from open3d_tpu.pipelines import features
    from open3d_tpu.pipelines import global_registration as gr

    if small:
        intr = PinholeCameraIntrinsic(160, 120, 131.25, 131.25, 79.5, 59.5)
    else:
        intr = PinholeCameraIntrinsic(640, 480, 525.0, 525.0, 319.5, 239.5)
    depths, _, extr, _ = synthetic.render_sequence(2, intrinsic=intr, span=0.4)
    clouds, fpfhs = [], []

    cap = 1024 if small else 16384

    def prep(depth, E):
        pcd = pointcloud_from_depth(depth, intr, E)
        down = pc_ops.voxel_down_sample(pcd, 0.05, capacity=cap)
        down = pc_ops.estimate_normals(down, max_nn=30, radius=0.1)
        return down, features.compute_fpfh_feature(down, radius=0.25, max_nn=64)

    pj = jax.jit(prep)
    for i in range(2):
        d, f = pj(depths[i], extr[i])
        clouds.append(d)
        fpfhs.append(f)

    def run(s, t, fs, ft, k):
        return gr.registration_ransac_based_on_feature_matching(
            s, t, fs, ft, max_correspondence_distance=0.07,
            criteria=gr.RANSACConvergenceCriteria(max_iteration=4096),
            key=k,
        ).transformation

    rj = jax.jit(run)
    dt_prep = timed_loop(pj, [(depths[0], extr[0])], n_reps=3)
    dt_ransac = timed_loop(
        rj, [(clouds[0], clouds[1], fpfhs[0], fpfhs[1], key)], n_reps=3
    )
    return dt_prep + dt_ransac


def main():
    import os

    from open3d_tpu.data import synthetic
    from open3d_tpu.geometry.camera import PinholeCameraIntrinsic

    small = bool(os.environ.get("BENCH_SMALL"))  # CPU smoke-test config
    if small:
        intrinsic = PinholeCameraIntrinsic(160, 128, 131.25, 131.25, 79.5, 63.5)
        n_frames = 2
    else:
        intrinsic = PinholeCameraIntrinsic(640, 480, 525.0, 525.0, 319.5, 239.5)
        n_frames = 8
    depths, colors, extrinsics, _ = synthetic.render_sequence(
        n_frames, intrinsic=intrinsic, span=0.8
    )
    _drain(depths)

    t_int, vbg = bench_integration(intrinsic, depths, colors, extrinsics, small)
    raycast_fps, ray_acc = bench_raycast(
        vbg, intrinsic, extrinsics[0], gt_depth=depths[0]
    )
    slam_fps = bench_slam(intrinsic, depths, colors, small)
    slam_half_fps = bench_slam(intrinsic, depths, colors, small, stride=2)
    key = jax.random.PRNGKey(0)
    icp_ips, icp_breakdown = bench_icp(key, small)
    odo_fps = bench_odometry(intrinsic, depths, colors)
    fpfh_s = bench_fpfh_ransac(key, small)

    extra = {
        "raycast_fps": round(raycast_fps, 2),
        "raycast_vs_30fps": round(raycast_fps / RAYCAST_TARGET_FPS, 3),
        "slam_fps": round(slam_fps, 2),
        "slam_vs_30fps": round(slam_fps / RAYCAST_TARGET_FPS, 3),
        "slam_half_res_track_fps": round(slam_half_fps, 2),
        "icp_iters_per_s": round(icp_ips, 1),
        **icp_breakdown,
        "odometry_fps": round(odo_fps, 2),
        "fpfh_ransac_s": round(fpfh_s, 3),
        **ray_acc,
        "sync": "honest (device->host drain; axon block_until_ready unreliable)",
    }
    print(
        json.dumps(
            {
                "metric": "tsdf_integration_fps",
                "value": round(t_int, 2),
                "unit": "frames/s",
                "vs_baseline": round(t_int / BASELINE_FPS, 3),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
