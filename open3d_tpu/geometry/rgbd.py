"""RGBDImage pair + unprojection to point clouds.

Reference: t/geometry/RGBDImage.cpp (pair container) and
t/geometry/PointCloud.h:600-665 (CreateFromDepthImage / CreateFromRGBDImage /
ProjectToRGBDImage).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from open3d_tpu.core.masking import FAR_COORD
from open3d_tpu.geometry.camera import PinholeCameraIntrinsic
from open3d_tpu.geometry.image import create_vertex_map
from open3d_tpu.geometry.pointcloud import PointCloud


@partial(jax.tree_util.register_dataclass, data_fields=["color", "depth"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class RGBDImage:
    color: jnp.ndarray  # (H, W, 3) float32 in [0, 1] (or (H, W) intensity)
    depth: jnp.ndarray  # (H, W) float32 metric; 0 = invalid


def pointcloud_from_depth(
    depth: jnp.ndarray,
    intrinsic: PinholeCameraIntrinsic,
    extrinsic: Optional[jnp.ndarray] = None,
    stride: int = 1,
    color: Optional[jnp.ndarray] = None,
) -> PointCloud:
    """Unproject a depth (+optional color) image into a world-frame PointCloud
    with capacity H*W/stride^2 and mask = depth validity
    (ref: PointCloud::CreateFromDepthImage, t/geometry/kernel/PointCloudImpl.h Unproject).

    `extrinsic` is world->camera (reference convention); points are returned in
    world frame.
    """
    d = depth[::stride, ::stride]
    vm = create_vertex_map(d, intrinsic.scaled(1.0 / stride) if stride > 1 else intrinsic)
    pts_cam = vm.reshape(-1, 3)
    valid = (d > 0.0).reshape(-1)
    if extrinsic is not None:
        R = extrinsic[:3, :3]
        t = extrinsic[:3, 3]
        # world = R^T (cam - t)
        pts = (pts_cam - t) @ R
    else:
        pts = pts_cam
    pts = jnp.where(valid[:, None], pts, FAR_COORD)
    attrs = {}
    if color is not None:
        c = color[::stride, ::stride]
        attrs["colors"] = c.reshape(-1, c.shape[-1]) if c.ndim == 3 else c.reshape(-1, 1)
    return PointCloud(positions=pts, mask=valid, attrs=attrs)


def pointcloud_from_rgbd(
    rgbd: RGBDImage,
    intrinsic: PinholeCameraIntrinsic,
    extrinsic: Optional[jnp.ndarray] = None,
    stride: int = 1,
) -> PointCloud:
    return pointcloud_from_depth(rgbd.depth, intrinsic, extrinsic, stride, color=rgbd.color)


def project_to_rgbd(
    pcd: PointCloud,
    intrinsic: PinholeCameraIntrinsic,
    extrinsic: Optional[jnp.ndarray] = None,
    depth_max: float = 10.0,
) -> RGBDImage:
    """Splat a point cloud into a depth(+color) image with z-buffering via
    scatter-min (ref: PointCloud::ProjectToRGBDImage, PointCloud.h:665)."""
    H, W = intrinsic.height, intrinsic.width
    pts = pcd.positions
    if extrinsic is not None:
        R = extrinsic[:3, :3]
        t = extrinsic[:3, 3]
        pts = pts @ R.T + t
    z = pts[:, 2]
    u = jnp.round(pts[:, 0] / jnp.maximum(z, 1e-6) * intrinsic.fx + intrinsic.cx).astype(jnp.int32)
    v = jnp.round(pts[:, 1] / jnp.maximum(z, 1e-6) * intrinsic.fy + intrinsic.cy).astype(jnp.int32)
    ok = pcd.mask & (z > 0) & (z < depth_max) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
    flat = jnp.where(ok, v * W + u, H * W)  # invalid -> dump slot
    depth = jnp.full((H * W + 1,), jnp.inf, dtype=jnp.float32)
    depth = depth.at[flat].min(jnp.where(ok, z, jnp.inf))
    depth_img = depth[: H * W].reshape(H, W)
    depth_img = jnp.where(jnp.isfinite(depth_img), depth_img, 0.0)
    colors = pcd.colors
    if colors is not None:
        # keep color of the z-buffer winner: a point wins iff its z equals the buffer
        win = ok & (z <= depth.reshape(-1)[jnp.clip(flat, 0, H * W - 1)] + 1e-6)
        cbuf = jnp.zeros((H * W + 1, colors.shape[-1]), dtype=jnp.float32)
        wbuf = jnp.zeros((H * W + 1, 1), dtype=jnp.float32)
        cbuf = cbuf.at[flat].add(jnp.where(win[:, None], colors, 0.0))
        wbuf = wbuf.at[flat].add(win[:, None].astype(jnp.float32))
        color_img = (cbuf[: H * W] / jnp.maximum(wbuf[: H * W], 1.0)).reshape(H, W, -1)
    else:
        color_img = jnp.zeros((H, W, 3), dtype=jnp.float32)
    return RGBDImage(color=color_img, depth=depth_img)
