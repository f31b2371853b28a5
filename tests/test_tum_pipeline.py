"""End-to-end TUM-format pipeline: write a sequence in the exact TUM RGB-D
benchmark layout, load it through `load_tum_sequence` (timestamp
association, 16-bit depth PNGs, quaternion ground truth), run the full
reconstruction system, and check ATE — the SAME code path real fr1/desk
data takes (see DATA.md for the real-data blocker)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from open3d_tpu.data import dataset as ds
from open3d_tpu.data import synthetic
from open3d_tpu.geometry.camera import PinholeCameraIntrinsic
from open3d_tpu.pipelines import reconstruction as rc


@pytest.fixture(scope="module")
def tum_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tum_seq"))
    intr = PinholeCameraIntrinsic(160, 120, 131.25, 131.25, 79.5, 59.5)
    depths, colors, extrinsics, _ = synthetic.render_sequence(
        8, intrinsic=intr, span=0.5
    )
    # camera->world ground truth (extrinsics are world->camera)
    traj = np.stack([np.linalg.inv(np.asarray(E)) for E in extrinsics])
    ds.write_tum_sequence(out, np.asarray(depths), np.asarray(colors), traj, intr)
    return out


class TestTUMLayout:
    def test_loads_with_association_and_gt(self, tum_dir):
        seq = ds.load_tum_sequence(tum_dir)
        assert len(seq) == 8
        assert seq.depth_scale == 5000.0
        assert seq.gt_trajectory is not None and seq.gt_trajectory.shape == (8, 4, 4)
        assert seq.intrinsic.width == 160  # intrinsic.txt picked up
        d, c = seq.read_frame(0)
        assert d.shape == (120, 160) and c.shape == (120, 160, 3)
        # 16-bit depth round-trip at scale 5000: < 0.2 mm quantization
        assert d.max() > 0.5

    def test_depth_roundtrip_accuracy(self, tum_dir):
        seq = ds.load_tum_sequence(tum_dir)
        intr = PinholeCameraIntrinsic(160, 120, 131.25, 131.25, 79.5, 59.5)
        depths, _, _, _ = synthetic.render_sequence(8, intrinsic=intr, span=0.5)
        d0, _ = seq.read_frame(0)
        ref = np.asarray(depths[0])
        both = (d0 > 0) & (ref > 0) & (ref < 6.0)
        err = np.abs(d0 - ref)[both]
        assert np.median(err) < 2e-4  # 16-bit @5000 = 0.2mm steps

    def test_run_system_on_tum_layout_ate(self, tum_dir, tmp_path):
        seq = ds.load_tum_sequence(tum_dir)
        cfg = rc.ReconstructionConfig(
            fragment_size=4,
            n_keyframes_per_n_frame=3,
            depth_max=4.0,
            voxel_size=0.02,
            block_count=8192,
            block_resolution=8,
            trunc_voxel_multiplier=4.0,
            downsample_voxel_size=0.05,
            registration_point_capacity=8192,
            fragment_point_capacity=65536,
            path_output=str(tmp_path / "out"),
        )
        vbg, traj, graph = rc.run_system(seq, cfg)
        ate = rc.absolute_trajectory_error(traj, seq.gt_trajectory)
        assert ate < 0.05, f"ATE {ate}"
