"""Distributed (sharded) reconstruction pipeline on the 8-device CPU mesh.

Mirrors the reference's Pool-based fan-out tests by asserting the sharded
stages give the same answers as the unsharded math (SURVEY §2.13 /
VERDICT round-1 item 4: the sharded pipeline must be exercised, including
non-divisible fragment/pair counts).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open3d_tpu.data import synthetic
from open3d_tpu.parallel import pipeline as pp
from open3d_tpu.parallel import fragments as pf
from open3d_tpu.pipelines import registration as reg
from open3d_tpu.geometry.pointcloud import PointCloud
from open3d_tpu.geometry.camera import PinholeCameraIntrinsic


@pytest.fixture(scope="module")
def tiny_sequence():
    intr = PinholeCameraIntrinsic(80, 60, 65.6, 65.6, 39.5, 29.5)
    # 6 frames -> 3 fragments x 2 frames (odd fragment count: exercises padding)
    depths, colors, extrinsics, _ = synthetic.render_sequence(
        6, intrinsic=intr, span=0.12
    )
    F, T = 3, 2
    dep = jnp.stack([depths[i * T : (i + 1) * T] for i in range(F)])
    col = jnp.stack([colors[i * T : (i + 1) * T] for i in range(F)])
    return intr, dep, col, extrinsics


def _run_stage1(intr, dep, col, n_dev):
    mesh = pp.make_pipeline_mesh(n_dev)
    return pp.make_fragments_sharded(
        dep, col, intr, mesh,
        voxel_size=0.04, block_count=512, block_resolution=8,
        point_capacity=4096, depth_max=6.0, frame_block_capacity=256,
    )


def test_make_fragments_sharded(tiny_sequence):
    intr, dep, col, extr = tiny_sequence
    frags = _run_stage1(intr, dep, col, 8)
    valid = np.asarray(frags.valid)
    assert valid.sum() == 3 and valid.shape[0] == 8  # padded to the mesh
    counts = np.asarray(jnp.sum(frags.mask, axis=1))
    assert (counts[:3] > 200).all()
    assert (counts[3:] == 0).all()
    # odometry chain recovers the GT inter-frame motion within each fragment
    for f in range(3):
        gt_rel = np.asarray(extr[2 * f] @ np.linalg.inv(np.asarray(extr[2 * f + 1])))
        est_rel = np.asarray(frags.poses[f, 1])
        np.testing.assert_allclose(est_rel, gt_rel, atol=1.2e-2)


def test_sharded_matches_single_device(tiny_sequence):
    intr, dep, col, _ = tiny_sequence
    f8 = _run_stage1(intr, dep, col, 8)
    f1 = _run_stage1(intr, dep, col, 1)
    np.testing.assert_allclose(
        np.asarray(f8.poses[:3]), np.asarray(f1.poses[:3]), atol=1e-5
    )
    # identical fragment surfaces (deterministic extraction order)
    for f in range(3):
        m8, m1 = np.asarray(f8.mask[f]), np.asarray(f1.mask[f])
        assert (m8 == m1).all()
        np.testing.assert_allclose(
            np.asarray(f8.positions[f])[m8],
            np.asarray(f1.positions[f])[m1],
            atol=1e-4,
        )


def test_register_pairs_sharded(tiny_sequence):
    intr, dep, col, extr = tiny_sequence
    frags = _run_stage1(intr, dep, col, 8)
    mesh = pp.make_pipeline_mesh(8)
    pairs = jnp.asarray([[0, 1], [1, 2], [0, 2]], jnp.int32)  # 3 % 8 != 0
    t0 = time.perf_counter()
    out = pp.register_pairs_sharded(frags, pairs, mesh, 0.08, max_iteration=30)
    jax.block_until_ready(out.transformations)
    t_sharded = time.perf_counter() - t0
    assert np.asarray(out.valid)[:3].all() and not np.asarray(out.valid)[3:].any()

    # per-pair results match the plain single-device ICP exactly
    for e, (s, t) in enumerate([(0, 1), (1, 2), (0, 2)]):
        src = PointCloud(
            positions=frags.positions[s], mask=frags.mask[s], attrs={}
        )
        tgt = PointCloud(
            positions=frags.positions[t],
            mask=frags.mask[t],
            attrs={"normals": frags.normals[t]},
        )
        res = reg.icp(
            src, tgt, 0.08,
            estimation=reg.TransformationEstimationPointToPlane(),
            criteria=reg.ICPConvergenceCriteria(max_iteration=30),
        )
        np.testing.assert_allclose(
            np.asarray(out.transformations[e]),
            np.asarray(res.transformation),
            atol=1e-5,
        )
        # ground truth: fragment f's base frame is world frame of extr[2f]
        gt = np.asarray(extr[2 * t]) @ np.linalg.inv(np.asarray(extr[2 * s]))
        trans_err = np.linalg.norm(np.asarray(out.transformations[e])[:3, 3] - gt[:3, 3])
        assert trans_err < 0.02, (e, trans_err)
    print(f"sharded stage-2 wall: {t_sharded:.3f}s")


def test_full_distributed_round_trip(tiny_sequence):
    """Stages 1 -> 2 -> 3 chained on the mesh (the dryrun_multichip path)."""
    intr, dep, col, extr = tiny_sequence
    mesh1d = pp.make_pipeline_mesh(8)
    frags = _run_stage1(intr, dep, col, 8)
    pairs = jnp.asarray([[0, 1], [1, 2]], jnp.int32)
    regs = pp.register_pairs_sharded(frags, pairs, mesh1d, 0.08)

    # stage 3: joint GN over the 3 real fragments on the 2-D mesh
    mesh2d = pf.make_mesh(8)
    F = 3
    poses0 = jnp.stack(
        [jnp.eye(4)] + [regs.transformations[0]] + [regs.transformations[1] @ regs.transformations[0]]
    ).astype(jnp.float32)
    # perturbing starting poses: GN must pull them back
    poses = poses0.at[1, :3, 3].add(jnp.asarray([0.01, -0.01, 0.005]))
    new_poses, rmse, n_in = pf.multiway_align(
        frags.positions[:F], frags.normals[:F], frags.mask[:F],
        poses, pairs, jnp.ones((2,), bool), 0.08, n_iterations=5, mesh=mesh2d,
    )
    assert float(rmse) < 0.01
    assert float(n_in) > 500
