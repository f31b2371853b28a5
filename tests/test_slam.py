"""Dense SLAM frame-to-model tests on the synthetic scene.

Mirrors the reference's golden-value strategy (SURVEY.md §4): run the
flagship pipeline on a scene with exact ground truth and assert trajectory
error bounds (the reference asserts fitness/rmse goldens on Redwood
fragments; here GT poses are exact so we check ATE directly).
"""

import jax
import jax.numpy as jnp
import pytest

from open3d_tpu.core import lie
from open3d_tpu.data import synthetic
from open3d_tpu.models import dense_slam


@pytest.fixture(scope="module")
def sequence():
    return synthetic.render_sequence(6, span=0.25)


def test_slam_tracks_and_reconstructs(sequence):
    depths, colors, extrinsics, intrinsic = sequence
    cfg = dense_slam.SLAMConfig(
        voxel_size=0.03,
        block_count=4096,
        frame_block_capacity=2048,
        depth_max=6.0,
        raycast_max_steps=120,
    )
    model = dense_slam.create_model(cfg, T_init=lie.invert_se3(extrinsics[0]))

    step = jax.jit(
        lambda m, d, c, rd: dense_slam.slam_step(m, d, c, rd, intrinsic),
        donate_argnums=(0,),
    )

    ray_depth = jnp.zeros_like(depths[0])
    poses = []
    for i in range(depths.shape[0]):
        res = step(model, depths[i], colors[i], ray_depth)
        model = res.model
        ray_depth = res.raycast_depth
        # donation invalidates model buffers on the next call — copy to host
        poses.append(jax.device_get(model.T_frame_to_world))

    # trajectory error vs ground truth (T_frame_to_world = inv(extrinsic))
    rot_errs, trans_errs = [], []
    for i, T in enumerate(poses):
        gt = lie.invert_se3(extrinsics[i])
        rot_e, trans_e = lie.pose_distance(T, gt)
        rot_errs.append(float(rot_e))
        trans_errs.append(float(trans_e))
    assert max(trans_errs) < 0.05, f"translation errors {trans_errs}"
    assert max(rot_errs) < 0.05, f"rotation errors {rot_errs}"

    # the model raycast from the final pose should match the rendered depth.
    # TSDF raycasts show "foreground fattening" halos at silhouette edges
    # (meters-scale errors on a few % of pixels — the reference has the same
    # artifact), so assert the MEDIAN error and the gross-outlier fraction.
    import numpy as np

    valid = (ray_depth > 0) & (depths[-1] > 0)
    frac_valid = float(jnp.mean(valid.astype(jnp.float32)))
    assert frac_valid > 0.5
    err = np.abs(np.asarray(ray_depth - depths[-1]))[np.asarray(valid)]
    assert float(np.median(err)) < 0.01, f"median raycast depth err {np.median(err)}"
    assert float((err > 0.05).mean()) < 0.15, f"gross outlier frac {(err > 0.05).mean()}"


def test_slam_first_frame_identity(sequence):
    depths, colors, extrinsics, intrinsic = sequence
    # same shapes as test_slam_tracks_and_reconstructs so the two tests
    # share one compiled slam_step program (42 s of extra compile before)
    cfg = dense_slam.SLAMConfig(
        voxel_size=0.03, block_count=4096, frame_block_capacity=2048,
        depth_max=6.0, raycast_max_steps=120,
    )
    model = dense_slam.create_model(cfg)
    res = dense_slam.slam_step(model, depths[0], colors[0], jnp.zeros_like(depths[0]), intrinsic)
    # frame 0 keeps the init pose and must report tracking ok
    assert bool(res.tracking_ok)
    assert jnp.allclose(res.model.T_frame_to_world, jnp.eye(4), atol=1e-6)
    assert int(res.model.vbg.num_active_blocks()) > 0


def test_slam_with_raycast_normals(sequence):
    """VERDICT r4 item 5: TSDF-gradient normal map from the raycaster feeds
    the next frame's point-to-plane tracking (ref: the normal render attr,
    t/geometry/VoxelBlockGrid.cpp:354-367) — tracking quality must hold."""
    depths, colors, extrinsics, intrinsic = sequence
    cfg = dense_slam.SLAMConfig(
        voxel_size=0.03,
        block_count=4096,
        frame_block_capacity=2048,
        depth_max=6.0,
        raycast_max_steps=120,
        raycast_normals=True,
    )
    model = dense_slam.create_model(cfg, T_init=lie.invert_se3(extrinsics[0]))
    step = jax.jit(
        lambda m, d, c, rd, rn: dense_slam.slam_step(
            m, d, c, rd, intrinsic, model_normal=rn
        ),
        donate_argnums=(0,),
    )
    ray_depth = jnp.zeros_like(depths[0])
    ray_normal = jnp.zeros(depths[0].shape + (3,), jnp.float32)
    trans_errs = []
    for i in range(4):
        res = step(model, depths[i], colors[i], ray_depth, ray_normal)
        model = res.model
        ray_depth, ray_normal = res.raycast_depth, res.raycast_normal
        assert ray_normal is not None and ray_normal.shape == depths[0].shape + (3,)
        gt = lie.invert_se3(extrinsics[i])
        _, trans_e = lie.pose_distance(jax.device_get(model.T_frame_to_world), gt)
        trans_errs.append(float(trans_e))
    assert max(trans_errs) < 0.05, f"translation errors {trans_errs}"
    # the normal map is unit-length on hits, zero on misses
    import numpy as np

    n = np.asarray(ray_normal)
    hit = np.asarray(ray_depth) > 0
    lens = np.linalg.norm(n[hit], axis=-1)
    assert np.all(np.abs(lens[lens > 0] - 1.0) < 1e-3)


def test_slam_half_res_model_raycast(sequence):
    """model_raycast_stride=2: the tracking model frame renders at half
    resolution (4x fewer rays) — the ATE gate must still hold."""
    depths, colors, extrinsics, intrinsic = sequence
    cfg = dense_slam.SLAMConfig(
        voxel_size=0.03,
        block_count=4096,
        frame_block_capacity=2048,
        depth_max=6.0,
        raycast_max_steps=120,
        model_raycast_stride=2,
    )
    model = dense_slam.create_model(cfg, T_init=lie.invert_se3(extrinsics[0]))
    step = jax.jit(
        lambda m, d, c, rd: dense_slam.slam_step(m, d, c, rd, intrinsic),
        donate_argnums=(0,),
    )
    H, W = depths[0].shape
    ray_depth = jnp.zeros((H // 2, W // 2), depths.dtype)
    trans_errs = []
    for i in range(4):
        res = step(model, depths[i], colors[i], ray_depth)
        model, ray_depth = res.model, res.raycast_depth
        assert ray_depth.shape == (H // 2, W // 2)
        gt = lie.invert_se3(extrinsics[i])
        _, te = lie.pose_distance(jax.device_get(model.T_frame_to_world), gt)
        trans_errs.append(float(te))
    assert max(trans_errs) < 0.05, f"translation errors {trans_errs}"
