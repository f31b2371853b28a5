"""IO facade: format-dispatched geometry/image/trajectory/checkpoint IO.

Reference surface: io/PointCloudIO.cpp / TriangleMeshIO.cpp format registry
(extension -> reader/writer), t/io/NumpyIO.cpp (npz — the VoxelBlockGrid
checkpoint format, VoxelBlockGrid.h:216-222), io/PoseGraphIO.cpp.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np

from open3d_tpu.io import image_io, pcd as pcd_io, ply as ply_io, trajectory
from open3d_tpu.io.image_io import read_depth, read_image, write_depth, write_image
from open3d_tpu.io.trajectory import (
    read_trajectory_log,
    read_trajectory_tum,
    write_trajectory_log,
    write_trajectory_tum,
)


def read_point_cloud(path: str, capacity: Optional[int] = None):
    """Extension-dispatched point-cloud read -> PointCloud
    (ref: io/PointCloudIO.cpp:ReadPointCloud registry)."""
    from open3d_tpu.geometry.pointcloud import PointCloud

    ext = os.path.splitext(path)[1].lower()
    if ext == ".ply":
        data = ply_io.read_ply(path)["vertex"]
        pos = np.stack([data["x"], data["y"], data["z"]], axis=-1)
        kw = {}
        if "nx" in data:
            kw["normals"] = np.stack([data["nx"], data["ny"], data["nz"]], axis=-1)
        if "red" in data:
            kw["colors"] = (
                np.stack([data["red"], data["green"], data["blue"]], axis=-1).astype(np.float32)
                / 255.0
            )
        return PointCloud.create(pos, capacity=capacity, **kw)
    if ext == ".pcd":
        data = pcd_io.read_pcd(path)
        pos = np.stack([data["x"], data["y"], data["z"]], axis=-1)
        kw = {}
        if "normal_x" in data:
            kw["normals"] = np.stack(
                [data["normal_x"], data["normal_y"], data["normal_z"]], axis=-1
            )
        if "rgb" in data:
            rgb = data["rgb"].view(np.uint32)
            kw["colors"] = (
                np.stack([rgb >> 16 & 255, rgb >> 8 & 255, rgb & 255], axis=-1).astype(np.float32)
                / 255.0
            )
        return PointCloud.create(pos, capacity=capacity, **kw)
    if ext in (".xyz", ".xyzn", ".pts"):
        arr = np.loadtxt(path, dtype=np.float32)
        kw = {"normals": arr[:, 3:6]} if ext == ".xyzn" and arr.shape[1] >= 6 else {}
        return PointCloud.create(arr[:, :3], capacity=capacity, **kw)
    if ext == ".npz":
        d = np.load(path)
        kw = {k: d[k] for k in d.files if k not in ("positions", "mask")}
        return PointCloud.create(d["positions"], capacity=capacity, mask=d.get("mask"), **kw)
    if ext == ".splat":
        from open3d_tpu.io import splat as splat_io

        return splat_io.read_splat(path, capacity=capacity)
    raise ValueError(f"unsupported point cloud format: {ext}")


def write_point_cloud(path: str, pcd) -> None:
    """(ref: io/PointCloudIO.cpp:WritePointCloud). Masked-out rows are
    dropped on write."""
    ext = os.path.splitext(path)[1].lower()
    d = pcd.to_numpy()
    pos = d["positions"]
    normals = d.get("normals")
    colors = d.get("colors")
    if ext == ".ply":
        ply_io.write_ply(path, pos, normals=normals, colors=colors)
    elif ext == ".pcd":
        pcd_io.write_pcd(path, pos, normals=normals, colors=colors)
    elif ext in (".xyz", ".pts"):
        np.savetxt(path, pos, fmt="%.7f")
    elif ext == ".xyzn":
        nn = normals if normals is not None else np.zeros_like(pos)
        np.savetxt(path, np.concatenate([pos, nn], axis=1), fmt="%.7f")
    elif ext == ".npz":
        np.savez(path, **{k: v for k, v in d.items()})
    elif ext == ".splat":
        from open3d_tpu.io import splat as splat_io

        splat_io.write_splat(path, pcd)
    else:
        raise ValueError(f"unsupported point cloud format: {ext}")


def read_triangle_mesh(path: str):
    """(ref: io/TriangleMeshIO.cpp registry — PLY/OBJ/STL/OFF; PLY + OBJ
    cover the reconstruction workloads)."""
    from open3d_tpu.geometry.trianglemesh import TriangleMesh

    ext = os.path.splitext(path)[1].lower()
    if ext == ".ply":
        data = ply_io.read_ply(path)
        v = data["vertex"]
        pos = np.stack([v["x"], v["y"], v["z"]], axis=-1)
        face = data.get("face", {})
        tris = face.get("vertex_indices", face.get("vertex_index"))
        vattrs = {}
        if "red" in v:
            vattrs["colors"] = (
                np.stack([v["red"], v["green"], v["blue"]], axis=-1).astype(np.float32) / 255.0
            )
        if "nx" in v:
            vattrs["normals"] = np.stack([v["nx"], v["ny"], v["nz"]], axis=-1)
        return TriangleMesh.create(pos, np.asarray(tris, np.int32), vertex_attrs=vattrs)
    if ext == ".obj":
        verts, tris = [], []
        with open(path) as f:
            for ln in f:
                p = ln.split()
                if not p:
                    continue
                if p[0] == "v":
                    verts.append([float(x) for x in p[1:4]])
                elif p[0] == "f":
                    ids = [int(t.split("/")[0]) - 1 for t in p[1:]]
                    for k in range(1, len(ids) - 1):  # fan-triangulate
                        tris.append([ids[0], ids[k], ids[k + 1]])
        return TriangleMesh.create(np.asarray(verts, np.float32), np.asarray(tris, np.int32))
    if ext == ".stl":
        from open3d_tpu.io import mesh_formats

        verts, tris = mesh_formats.read_stl(path)
        return TriangleMesh.create(verts, tris)
    if ext == ".off":
        from open3d_tpu.io import mesh_formats

        verts, tris = mesh_formats.read_off(path)
        return TriangleMesh.create(verts, tris)
    if ext in (".gltf", ".glb"):
        from open3d_tpu.io import mesh_formats

        verts, tris = mesh_formats.read_glb(path)
        return TriangleMesh.create(verts, tris)
    raise ValueError(f"unsupported mesh format: {ext}")


def write_triangle_mesh(path: str, mesh) -> None:
    ext = os.path.splitext(path)[1].lower()
    verts, tris = mesh.compact()
    if ext == ".ply":
        ply_io.write_ply(path, verts, triangles=tris)
    elif ext == ".obj":
        with open(path, "w") as f:
            for v in verts:
                f.write(f"v {v[0]:.7f} {v[1]:.7f} {v[2]:.7f}\n")
            for t in tris:
                f.write(f"f {t[0] + 1} {t[1] + 1} {t[2] + 1}\n")
    elif ext == ".stl":
        from open3d_tpu.io import mesh_formats

        mesh_formats.write_stl(path, verts, tris)
    elif ext == ".off":
        from open3d_tpu.io import mesh_formats

        mesh_formats.write_off(path, verts, tris)
    elif ext in (".gltf", ".glb"):
        from open3d_tpu.io import mesh_formats

        mesh_formats.write_glb(path, verts, tris)
    else:
        raise ValueError(f"unsupported mesh format: {ext}")


# ---------------------------------------------------------------------------
# VoxelBlockGrid checkpoints (npz schema mirrors the reference's Save/Load)
# ---------------------------------------------------------------------------


def write_voxel_block_grid(path: str, vbg) -> None:
    """npz: {table, tsdf, weight, color, voxel_size, block_resolution,
    sdf_trunc} (ref: VoxelBlockGrid::Save -> t/io/NumpyIO.cpp npz of hashmap
    keys + value buffers)."""
    np.savez_compressed(
        path,
        table=np.asarray(vbg.table),
        # stored flat (C+1, B^3) for schema stability across payload tilings
        tw=np.asarray(vbg.tw).reshape(vbg.tw.shape[0], -1),
        color=np.asarray(vbg.color).reshape(vbg.color.shape[0], -1),
        voxel_size=np.float64(vbg.voxel_size),
        block_resolution=np.int64(vbg.block_resolution),
        sdf_trunc=np.float64(vbg.sdf_trunc),
    )


def read_voxel_block_grid(path: str):
    from open3d_tpu.geometry.voxel_block_grid import VoxelBlockGrid
    import jax.numpy as jnp

    from open3d_tpu.geometry.voxel_block_grid import payload_shape

    d = np.load(path)
    B3 = int(d["block_resolution"]) ** 3
    R, L = payload_shape(B3)
    C1 = d["tw"].shape[0]
    col = d["color"]
    col3 = col.reshape(C1, R, L) if col.size else col.reshape(C1, 0, 0)
    return VoxelBlockGrid(
        table=jnp.asarray(d["table"]),
        tw=jnp.asarray(d["tw"].reshape(C1, R, L)),
        color=jnp.asarray(col3),
        voxel_size=float(d["voxel_size"]),
        block_resolution=int(d["block_resolution"]),
        sdf_trunc=float(d["sdf_trunc"]),
    )


# pose graph IO lives with the pipeline (same JSON schema as the reference)
def read_pose_graph(path: str):
    from open3d_tpu.pipelines.pose_graph import read_pose_graph as _r

    return _r(path)


def write_pose_graph(path: str, graph) -> None:
    from open3d_tpu.pipelines.pose_graph import write_pose_graph as _w

    _w(path, graph)
