"""CLI smoke tests (ref: python/tools/cli.py)."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from open3d_tpu.tools import cli


@pytest.fixture()
def ply_file(tmp_path):
    from open3d_tpu.geometry.pointcloud import PointCloud
    from open3d_tpu.io import write_point_cloud

    rng = np.random.default_rng(0)
    pcd = PointCloud.create(jnp.asarray(rng.normal(size=(200, 3)).astype(np.float32)))
    p = str(tmp_path / "cloud.ply")
    write_point_cloud(p, pcd)
    return p


def test_cli_info(ply_file, capsys):
    cli.main(["info", ply_file])
    out = capsys.readouterr().out
    assert "PointCloud: 200 points" in out


def test_cli_convert_pcd(ply_file, tmp_path, capsys):
    dst = str(tmp_path / "cloud.pcd")
    cli.main(["convert", ply_file, dst])
    assert os.path.isfile(dst)
    from open3d_tpu.io import read_point_cloud

    back = read_point_cloud(dst)
    assert len(back.to_numpy()["positions"]) == 200


def test_cli_convert_mesh(tmp_path, capsys):
    from open3d_tpu.geometry.trianglemesh import TriangleMesh
    from open3d_tpu.io import write_triangle_mesh

    v = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    t = np.asarray([[0, 1, 2]], np.int32)
    src = str(tmp_path / "m.obj")
    write_triangle_mesh(src, TriangleMesh.create(v, t))
    dst = str(tmp_path / "m.stl")
    cli.main(["convert", src, dst])
    assert os.path.isfile(dst)
    cli.main(["info", dst])
    assert "1 triangles" in capsys.readouterr().out
