"""Parity test: the Pallas scatter-row fuse kernel (interpreted on CPU)
matches the portable XLA fuse path bit-for-bit (tsdf/weight) and within one
quantization LSB (color rounding)."""

import jax
import jax.numpy as jnp
import numpy as np

from open3d_tpu.data import synthetic
from open3d_tpu.geometry import voxel_block_grid as vbg_mod
from open3d_tpu.geometry.camera import PinholeCameraIntrinsic


def _setup():
    intr = PinholeCameraIntrinsic(160, 120, 131.25, 131.25, 79.5, 59.5)
    depths, colors, extr, _ = synthetic.render_sequence(2, intrinsic=intr, span=0.1)
    vbg = vbg_mod.create(
        voxel_size=0.02, block_resolution=16, block_count=1024, with_color=True
    )
    return intr, depths, colors, extr, vbg


def _one_frame(vbg, intr, depth, color, extr, use_pallas):
    keys, _ = vbg_mod.compute_unique_block_coordinates(
        vbg, depth, intr, extr, depth_max=3.0, frame_block_capacity=256
    )
    return vbg_mod.integrate(
        vbg, keys, depth, color, intr, extr, depth_max=3.0, use_pallas=use_pallas
    )


def test_fuse_kernel_matches_xla_path():
    intr, depths, colors, extr, vbg0 = _setup()
    va = vbg0
    vb = vbg0
    for i in range(2):
        va = _one_frame(va, intr, depths[i], colors[i], extr[i], use_pallas=False)
        vb = _one_frame(vb, intr, depths[i], colors[i], extr[i], use_pallas=True)
    # identical table
    np.testing.assert_array_equal(np.asarray(va.table), np.asarray(vb.table))
    # tsdf/weight: identical quantized words
    ta, wa = va.tsdf_weight()
    tb, wb = vb.tsdf_weight()
    np.testing.assert_array_equal(np.asarray(wa), np.asarray(wb))
    np.testing.assert_allclose(np.asarray(ta), np.asarray(tb), atol=1.5 / 16383.0)
    # color within one 11-bit LSB
    ca = np.asarray(va.color_f32())
    cb = np.asarray(vb.color_f32())
    assert np.abs(ca - cb).max() <= 1.5 / 1023.0
    # dump-row invariant
    assert int(np.asarray(vb.tw)[-1].sum()) == 0


def test_fuse_kernel_nocolor():
    intr, depths, colors, extr, _ = _setup()
    vbg0 = vbg_mod.create(
        voxel_size=0.02, block_resolution=16, block_count=1024, with_color=False
    )
    va = _one_frame(vbg0, intr, depths[0], None, extr[0], use_pallas=False)
    vb = _one_frame(vbg0, intr, depths[0], None, extr[0], use_pallas=True)
    ta, wa = va.tsdf_weight()
    tb, wb = vb.tsdf_weight()
    np.testing.assert_array_equal(np.asarray(wa), np.asarray(wb))
    np.testing.assert_allclose(np.asarray(ta), np.asarray(tb), atol=1.5 / 16383.0)
