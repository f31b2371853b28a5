"""IO round-trip tests: PLY/PCD/OBJ, 16-bit depth PNG, trajectories, VBG npz.

(ref test model: cpp/tests/io/ — write/read round-trips on synthetic data)"""

import numpy as np
import jax.numpy as jnp
import pytest

import open3d_tpu.io as io
from open3d_tpu.geometry.pointcloud import PointCloud
from open3d_tpu.geometry import trianglemesh as tm
from open3d_tpu.io import pcd as pcd_io


def _cloud(n=100, seed=0):
    rng = np.random.RandomState(seed)
    pos = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    col = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return PointCloud.create(pos, normals=nrm, colors=col)


class TestPLY:
    @pytest.mark.parametrize("binary", [True, False])
    def test_roundtrip(self, tmp_path, binary):
        pcd = _cloud()
        p = str(tmp_path / "a.ply")
        io.ply_io.write_ply(
            p,
            np.asarray(pcd.positions),
            normals=np.asarray(pcd.attrs["normals"]),
            colors=np.asarray(pcd.attrs["colors"]),
            binary=binary,
        )
        back = io.read_point_cloud(p)
        np.testing.assert_allclose(np.asarray(back.positions), np.asarray(pcd.positions), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(back.attrs["normals"]), np.asarray(pcd.attrs["normals"]), atol=1e-5
        )
        # colors quantized to uint8
        np.testing.assert_allclose(
            np.asarray(back.attrs["colors"]), np.asarray(pcd.attrs["colors"]), atol=1 / 255.0
        )

    def test_mesh_roundtrip(self, tmp_path):
        v = np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
        t = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
        mesh = tm.TriangleMesh.create(v, t)
        p = str(tmp_path / "m.ply")
        io.write_triangle_mesh(p, mesh)
        back = io.read_triangle_mesh(p)
        assert np.asarray(back.triangles).shape == (2, 3)
        assert abs(float(back.surface_area()) - 1.0) < 1e-6

    def test_obj_roundtrip(self, tmp_path):
        v = np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
        t = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
        mesh = tm.TriangleMesh.create(v, t)
        p = str(tmp_path / "m.obj")
        io.write_triangle_mesh(p, mesh)
        back = io.read_triangle_mesh(p)
        assert abs(float(back.surface_area()) - 1.0) < 1e-6


class TestPCD:
    @pytest.mark.parametrize("binary", [True, False])
    def test_roundtrip(self, tmp_path, binary):
        pcd = _cloud(seed=1)
        p = str(tmp_path / "a.pcd")
        io.write_point_cloud(p, pcd) if binary else pcd_io.write_pcd(
            p,
            np.asarray(pcd.positions),
            normals=np.asarray(pcd.attrs["normals"]),
            colors=np.asarray(pcd.attrs["colors"]),
            binary=False,
        )
        back = io.read_point_cloud(p)
        np.testing.assert_allclose(np.asarray(back.positions), np.asarray(pcd.positions), atol=1e-5)

    def test_lzf_roundtrip(self):
        rng = np.random.RandomState(0)
        data = rng.bytes(10000) + b"\x00" * 5000
        comp = pcd_io.lzf_compress(data)
        assert pcd_io.lzf_decompress(comp, len(data)) == data

    def test_binary_compressed_read(self, tmp_path):
        """Build a binary_compressed PCD by hand and read it back."""
        import struct

        n = 50
        rng = np.random.RandomState(2)
        xyz = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        raw = b"".join(np.ascontiguousarray(xyz[:, i]).tobytes() for i in range(3))
        comp = pcd_io.lzf_compress(raw)
        header = (
            "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
            f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\nDATA binary_compressed\n"
        )
        p = str(tmp_path / "c.pcd")
        with open(p, "wb") as f:
            f.write(header.encode())
            f.write(struct.pack("<II", len(comp), len(raw)))
            f.write(comp)
        d = pcd_io.read_pcd(p)
        np.testing.assert_allclose(d["x"], xyz[:, 0], atol=1e-6)
        np.testing.assert_allclose(d["z"], xyz[:, 2], atol=1e-6)


class TestImages:
    def test_depth_png_roundtrip(self, tmp_path):
        rng = np.random.RandomState(0)
        depth = rng.uniform(0.5, 4.0, (24, 32)).astype(np.float32)
        p = str(tmp_path / "d.png")
        io.write_depth(p, depth, depth_scale=1000.0)
        back = io.read_depth(p, depth_scale=1000.0)
        np.testing.assert_allclose(back, depth, atol=1.5e-3)  # 1mm quantization

    def test_color_roundtrip(self, tmp_path):
        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (24, 32, 3), np.uint8)
        p = str(tmp_path / "c.png")
        io.write_image(p, img)
        assert np.array_equal(io.read_image(p), img)


class TestTrajectories:
    def test_log_roundtrip(self, tmp_path):
        from open3d_tpu.core import lie

        rng = np.random.RandomState(0)
        poses = np.stack(
            [np.asarray(lie.se3_exp(jnp.asarray(rng.normal(0, 0.5, 6).astype(np.float32)))) for _ in range(5)]
        )
        p = str(tmp_path / "t.log")
        io.write_trajectory_log(p, poses)
        back = io.read_trajectory_log(p)
        np.testing.assert_allclose(back, poses, atol=1e-6)

    def test_tum_roundtrip(self, tmp_path):
        from open3d_tpu.core import lie

        rng = np.random.RandomState(1)
        poses = np.stack(
            [np.asarray(lie.se3_exp(jnp.asarray(rng.normal(0, 0.5, 6).astype(np.float32)))) for _ in range(5)]
        )
        p = str(tmp_path / "t.txt")
        io.write_trajectory_tum(p, poses)
        ts, back = io.read_trajectory_tum(p)
        assert ts.shape == (5,)
        np.testing.assert_allclose(back, poses, atol=1e-5)


class TestVBGCheckpoint:
    def test_roundtrip(self, tmp_path):
        import jax
        from open3d_tpu.data import synthetic
        from open3d_tpu.geometry import voxel_block_grid as vbg_mod
        from open3d_tpu.geometry.camera import PinholeCameraIntrinsic

        intr = PinholeCameraIntrinsic(160, 120, 131.25, 131.25, 79.5, 59.5)
        depths, colors, extrinsics, _ = synthetic.render_sequence(2, intrinsic=intr)
        vbg = vbg_mod.create(voxel_size=0.02, block_resolution=8, block_count=1024)
        keys, _ = vbg_mod.compute_unique_block_coordinates(
            vbg, depths[0], intr, extrinsics[0], depth_max=4.0, frame_block_capacity=512
        )
        vbg = vbg_mod.integrate(vbg, keys, depths[0], colors[0], intr, extrinsics[0], depth_max=4.0)
        p = str(tmp_path / "vbg.npz")
        io.write_voxel_block_grid(p, vbg)
        back = io.read_voxel_block_grid(p)
        assert back.voxel_size == vbg.voxel_size
        np.testing.assert_array_equal(np.asarray(back.table), np.asarray(vbg.table))
        np.testing.assert_array_equal(np.asarray(back.tw), np.asarray(vbg.tw))


class TestNative:
    def test_lzf_cross_implementation(self):
        from open3d_tpu import native

        rng = np.random.RandomState(0)
        for data in [rng.bytes(5000), b"abc" * 4000, b"", b"\x00" * 100000]:
            c = native.lzf_compress(data)
            assert native.lzf_decompress(c, len(data)) == data
            assert pcd_io.lzf_decompress(c, len(data)) == data
            c2 = pcd_io.lzf_compress(data)
            assert native.lzf_decompress(c2, len(data)) == data

    def test_prefetcher(self, tmp_path):
        from open3d_tpu.native import FilePrefetcher

        rng = np.random.RandomState(1)
        paths, blobs = [], []
        for i in range(12):
            p = str(tmp_path / f"f{i}.bin")
            b = rng.bytes(500 + 37 * i)
            with open(p, "wb") as f:
                f.write(b)
            paths.append(p)
            blobs.append(b)
        with FilePrefetcher(paths, n_threads=3, depth=4) as pf:
            for i in range(12):
                assert pf.get(i) == blobs[i]

    def test_sequence_iter_frames(self, tmp_path):
        from open3d_tpu.data import dataset as ds

        seq = ds.synthetic_rgbd_sequence(
            n_frames=3, width=64, height=48, out_dir=str(tmp_path / "seq")
        )
        frames = list(seq.iter_frames())
        assert len(frames) == 3
        d0, c0 = seq.read_frame(0)
        np.testing.assert_allclose(frames[0][0], d0, atol=1e-6)
        np.testing.assert_allclose(frames[0][1], c0, atol=1e-6)


class TestMeshFormats:
    """STL / OFF / GLB round-trips (ref: io/file_format/FileSTL.cpp,
    FileOFF.cpp, FileGLTF.cpp)."""

    def _mesh(self):
        import numpy as np
        v = np.asarray(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32
        )
        t = np.asarray([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]], np.int32)
        return v, t

    def _roundtrip(self, tmp_path, ext):
        import numpy as np
        from open3d_tpu.geometry.trianglemesh import TriangleMesh
        from open3d_tpu.io import read_triangle_mesh, write_triangle_mesh

        v, t = self._mesh()
        mesh = TriangleMesh.create(v, t)
        p = str(tmp_path / f"m{ext}")
        write_triangle_mesh(p, mesh)
        back = read_triangle_mesh(p)
        v2, t2 = back.compact()
        # same vertex SET and same triangle count (STL welds/reorders)
        assert len(t2) == len(t)
        sv = {tuple(np.round(x, 5)) for x in np.asarray(v)}
        sv2 = {tuple(np.round(x, 5)) for x in np.asarray(v2)}
        assert sv == sv2

    def test_stl_roundtrip(self, tmp_path):
        self._roundtrip(tmp_path, ".stl")

    def test_off_roundtrip(self, tmp_path):
        self._roundtrip(tmp_path, ".off")

    def test_glb_roundtrip(self, tmp_path):
        self._roundtrip(tmp_path, ".glb")


class TestSplat:
    def test_splat_roundtrip(self, tmp_path):
        """(ref: t/io/file_format/FileSPLAT.cpp — 32-byte gaussians; color
        via SH DC + sigmoid opacity, quats at (q+1)*128 wxyz)"""
        import numpy as np

        from open3d_tpu.geometry.pointcloud import PointCloud
        from open3d_tpu.io import read_point_cloud, write_point_cloud

        rng = np.random.default_rng(0)
        n = 64
        pos = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        f_dc = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        opacity = rng.uniform(-3, 3, (n, 1)).astype(np.float32)
        scale = rng.uniform(0.01, 0.2, (n, 3)).astype(np.float32)
        q = rng.normal(size=(n, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        q[q[:, 0] < 0] *= -1  # canonical hemisphere (u8 roundtrip sign)
        pcd = PointCloud.create(
            jnp.asarray(pos), f_dc=jnp.asarray(f_dc),
            opacity=jnp.asarray(opacity), scale=jnp.asarray(scale),
            rot=jnp.asarray(q),
        )
        p = str(tmp_path / "g.splat")
        write_point_cloud(p, pcd)
        assert (tmp_path / "g.splat").stat().st_size == 32 * n
        back = read_point_cloud(p)
        assert int(back.count()) == n
        # the writer reorders by volume*opacity; positions roundtrip as
        # exact f32, so align the two sets through their position order
        bpos = np.asarray(back.positions)
        oa = np.lexsort(pos.T)
        ob = np.lexsort(bpos.T)
        np.testing.assert_allclose(bpos[ob], pos[oa], atol=0.0)
        # scales exact f32; opacity/color/rot quantized to 8 bits
        np.testing.assert_allclose(
            np.asarray(back.attrs["scale"])[ob], scale[oa], atol=0.0
        )
        sig_in = 1 / (1 + np.exp(-opacity.reshape(-1)[oa]))
        sig_out = 1 / (1 + np.exp(-np.asarray(back.attrs["opacity"]).reshape(-1)[ob]))
        np.testing.assert_allclose(sig_out, sig_in, atol=1.0 / 255)
        qr = np.asarray(back.attrs["rot"])[ob]
        np.testing.assert_allclose(qr, q[oa], atol=0.02)
