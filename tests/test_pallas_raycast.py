"""Pallas raycast: pass-1 tile lists + interpreted march vs the XLA
raycast and the true synthetic depth (small scene; the kernel runs in
Mosaic interpret mode on CPU — performance is measured on TPU by bench.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from open3d_tpu.data import synthetic
from open3d_tpu.geometry import voxel_block_grid as vbg_mod
from open3d_tpu.geometry.camera import PinholeCameraIntrinsic
from open3d_tpu.ops.pallas import raycast as prc


def _build(intr, n_frames=4, voxel=0.03):
    depths, colors, extr, _ = synthetic.render_sequence(
        n_frames, intrinsic=intr, span=0.15
    )
    vbg = vbg_mod.create(
        voxel_size=voxel, block_resolution=16, block_count=4096, with_color=False
    )
    for i in range(n_frames):
        keys, _ = vbg_mod.compute_unique_block_coordinates(
            vbg, depths[i], intr, extr[i], depth_max=4.0, frame_block_capacity=1024
        )
        vbg = vbg_mod.integrate(
            vbg, keys, depths[i], None, intr, extr[i], depth_max=4.0, use_pallas=False
        )
    return vbg, depths, extr


class TestTileLists:
    def test_lists_cover_visible_blocks(self):
        intr = PinholeCameraIntrinsic(80, 64, 65.6, 65.6, 39.5, 31.5)
        vbg, depths, extr = _build(intr)
        lists = prc.build_tile_lists(vbg, intr, extr[0], 0.1, 4.0, K=40)
        nk = np.asarray(lists.nk)
        assert nk.max() > 0
        # every listed row is a live block within the camera frustum
        rows = np.asarray(lists.rows)
        C = vbg.capacity
        from open3d_tpu.core import hashmap as hm

        occ = np.asarray(hm.occupied_mask(vbg.table))
        live_rows = rows[rows >= 0]
        assert occ[live_rows].all()
        # tiny focal length -> wide tile beams; a few overflowing tiles
        # are expected and dropped far-first (stat surfaced, not silent)
        assert int(lists.overflow) < 64

    def test_depth_sorted_within_tile(self):
        intr = PinholeCameraIntrinsic(80, 64, 65.6, 65.6, 39.5, 31.5)
        vbg, depths, extr = _build(intr)
        lists = prc.build_tile_lists(vbg, intr, extr[0], 0.1, 4.0, K=40)
        # check one populated tile: entry depths are non-decreasing
        from open3d_tpu.core import hashmap as hm

        nk = np.asarray(lists.nk)
        t = int(np.argmax(nk))
        K = 40
        rows = np.asarray(lists.rows[t * K : t * K + nk[t]])
        coords = np.asarray(hm.unpack_coords(vbg.table[rows])).astype(np.float32)
        E = np.asarray(extr[0])
        centers = (coords + 0.5) * vbg.block_size
        z = (centers @ E[:3, :3].T + E[:3, 3])[:, 2]
        # z0-sorted modulo the 14-bit quantization of the sort key
        assert np.all(np.diff(z) > -0.1)


class TestMarchInterpret:
    def test_depth_matches_truth(self):
        intr = PinholeCameraIntrinsic(80, 64, 65.6, 65.6, 39.5, 31.5)
        vbg, depths, extr = _build(intr)
        d_fast, ovf = jax.jit(
            lambda v, E: prc.raycast_depth(
                v, intr, E, depth_min=0.1, depth_max=4.0, K=40, interpret=True
            )
        )(vbg, extr[0])
        dn = np.asarray(d_fast)
        dt = np.asarray(depths[0])
        both = (dn > 0) & (dt > 0)
        assert both.mean() > 0.7, both.mean()  # hits most of the surface
        err = np.abs(dn - dt)[both]
        # nearest-sample march + secant: sub-voxel accuracy on the bulk
        assert np.median(err) < vbg.voxel_size, np.median(err)
        assert np.quantile(err, 0.9) < 3 * vbg.voxel_size
        # few false misses where the true surface exists and is in range
        in_range = (dt > 0.3) & (dt < 3.5)
        assert ((dn == 0) & in_range).mean() < 0.08

    def test_miss_rays_zero(self):
        intr = PinholeCameraIntrinsic(64, 32, 40.0, 40.0, 31.5, 15.5)
        vbg = vbg_mod.create(
            voxel_size=0.03, block_resolution=16, block_count=512, with_color=False
        )
        E = jnp.eye(4, dtype=jnp.float32)
        d, ovf = prc.raycast_depth(
            vbg, intr, E, depth_min=0.1, depth_max=3.0, K=8, interpret=True
        )
        assert float(jnp.max(jnp.abs(d))) == 0.0


class TestAuxMaps:
    """VERDICT r4 item 5: normal / index / interp-ratio render attrs
    (ref: t/geometry/VoxelBlockGrid.cpp:354-367)."""

    def test_gradient_normals_and_index_ratio(self):
        intr = PinholeCameraIntrinsic(80, 64, 65.6, 65.6, 39.5, 31.5)
        vbg, depths, extr = _build(intr, n_frames=4, voxel=0.03)
        res = vbg_mod.raycast(
            vbg, intr, extr[0], 0.1, 4.0, use_pallas=False,
            with_normals=True, with_index_ratio=True,
        )
        hit = np.asarray(res.mask)
        assert hit.mean() > 0.5
        # unit normals on hits, camera-facing (dot with view ray <= 0)
        n = np.asarray(res.normal)
        lens = np.linalg.norm(n[hit], axis=-1)
        assert np.all(np.abs(lens[lens > 0] - 1.0) < 1e-3)
        v = np.asarray(res.vertex)
        R = np.asarray(extr[0][:3, :3])
        t = np.asarray(extr[0][:3, 3])
        origin = -R.T @ t
        rays = v[hit] - origin
        d = np.sum(n[hit] * rays, axis=-1)
        assert (d <= 1e-6).mean() > 0.95
        # index + ratio reconstruct the trilinear TSDF ~ 0 at the surface
        idx8 = np.asarray(res.index)[hit]
        wt8 = np.asarray(res.interp_ratio)[hit]
        tw_flat = np.asarray(vbg.tw).reshape(-1)
        ts = (tw_flat[np.maximum(idx8, 0)] >> 16).astype(np.float32) / 16383.0
        wsum = wt8.sum(-1)
        good = wsum > 0.5
        recon = (ts * wt8).sum(-1)[good] / wsum[good]
        assert np.median(np.abs(recon)) < 0.1  # |tsdf| ~ 0 at the crossing
        # ratios are a partition of unity where all 8 corners exist
        full = (idx8 >= 0).all(-1)
        assert np.allclose(wt8[full].sum(-1), 1.0, atol=1e-4)
