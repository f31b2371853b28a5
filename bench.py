"""Benchmark: TSDF VoxelBlockGrid integration throughput (frames/second).

North-star metric (BASELINE.md): the reference's native CUDA VoxelBlockGrid
integrates at ~100 Hz on a GTX 1070
(docs/tutorial/t_reconstruction_system/integration.rst:43) at 640x480,
voxel_size 3.0/512, 16^3 blocks. This benchmark reproduces that workload on
TPU: per frame = frustum touch -> hashmap activate -> fused projective SDF
update of all touched blocks, as one jitted donated-buffer step.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_FPS = 100.0  # reference CUDA kernels, GTX 1070


def main():
    from open3d_tpu.data import synthetic
    from open3d_tpu.geometry import voxel_block_grid as vbg_mod
    from open3d_tpu.geometry.camera import PinholeCameraIntrinsic

    intrinsic = PinholeCameraIntrinsic(640, 480, 525.0, 525.0, 319.5, 239.5)
    n_frames = 16
    depths, colors, extrinsics, _ = synthetic.render_sequence(
        n_frames, intrinsic=intrinsic, span=0.8
    )
    depths = jax.block_until_ready(depths)

    vbg = vbg_mod.create(
        voxel_size=3.0 / 512,
        block_resolution=16,
        block_count=40960,
        with_color=True,
    )

    @jax.jit
    def step(vbg, depth, color, extrinsic):
        keys, _ = vbg_mod.compute_unique_block_coordinates(
            vbg, depth, intrinsic, extrinsic, depth_max=3.0, frame_block_capacity=8192
        )
        return vbg_mod.integrate(
            vbg, keys, depth, color, intrinsic, extrinsic, depth_max=3.0
        )

    # warmup / compile
    vbg = jax.block_until_ready(step(vbg, depths[0], colors[0], extrinsics[0]))

    n_reps = 3
    t0 = time.perf_counter()
    for _ in range(n_reps):
        for i in range(n_frames):
            vbg = step(vbg, depths[i], colors[i], extrinsics[i])
    jax.block_until_ready(vbg)
    dt = time.perf_counter() - t0

    fps = n_reps * n_frames / dt
    print(
        json.dumps(
            {
                "metric": "tsdf_integration_fps",
                "value": round(fps, 2),
                "unit": "frames/s (640x480, voxel 5.9mm, 16^3 blocks)",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
