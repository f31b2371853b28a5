"""Color-map optimization: sharpen mesh colors by refining camera poses.

Reference: pipelines/color_map/RigidOptimizer.cpp:71 (RunRigidOptimizer) and
NonRigidOptimizer.cpp:85 — Zhou-Koltun SIGGRAPH'14 "Color Map Optimization
for 3D Reconstruction with Consumer Depth Cameras". Rigid mode: per camera,
Gauss-Newton on the pose minimizing sum_v (I_c(proj(T_c, x_v)) - proxy_v)^2
where proxy_v is the running mean intensity of vertex v over the images that
see it; visibility is a projected-depth vs image-depth test
(ColorMapUtils.cpp CreateVertexAndImageVisibility) with an image-boundary
margin and a depth-discontinuity mask.

TPU design: everything is vertices x cameras dense vector math — bilinear
image sampling with analytic gradients (geometry/image.py), per-camera 6x6
JtJ via one einsum reduction, all-camera poses updated in one vmapped batch;
the proxy update is a masked mean over the camera axis. No per-vertex loops,
no host syncs inside the iteration. The non-rigid variant adds a per-camera
2D warp-field correction on top of the same machinery
(NonRigidOptimizer.cpp:85's ImageWarpingField), applied as a bilinearly
interpolated control lattice over image space.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from open3d_tpu.core import lie
from open3d_tpu.geometry import image as im
from open3d_tpu.geometry.camera import PinholeCameraIntrinsic


@dataclasses.dataclass(frozen=True)
class RigidOptimizerOption:
    """(ref: pipelines/color_map/RigidOptimizer.h — same knob names)"""

    maximum_iteration: int = 100
    maximum_allowable_depth: float = 2.5
    depth_threshold_for_visibility_check: float = 0.03
    depth_threshold_for_discontinuity_check: float = 0.1
    half_dilation_kernel_size_for_discontinuity_map: int = 3
    image_boundary_margin: int = 10
    invisible_vertex_color_knn: int = 3


@dataclasses.dataclass(frozen=True)
class NonRigidOptimizerOption(RigidOptimizerOption):
    """(ref: NonRigidOptimizer.h — adds the warp-field lattice)"""

    number_of_vertical_anchors: int = 16
    non_rigid_anchor_point_weight: float = 0.316


class _Prepared(NamedTuple):
    gray: jnp.ndarray  # (N, H, W)
    dx: jnp.ndarray
    dy: jnp.ndarray
    depth: jnp.ndarray
    mask: jnp.ndarray  # (N, H, W) bool: valid + not near discontinuity


def _prepare_images(colors, depths, opt: RigidOptimizerOption) -> _Prepared:
    """(ref: CreateUtilImagesFromRGBD + CreateDepthBoundaryMasks)"""
    gray = jax.vmap(im.rgb_to_gray)(colors) if colors.ndim == 4 else colors
    dx, dy = jax.vmap(im.filter_sobel)(gray)
    valid = (depths > 0) & (depths < opt.maximum_allowable_depth)
    # depth-discontinuity mask: large local depth jump -> drop a dilated rim
    ddx, ddy = jax.vmap(im.filter_sobel)(depths)
    disc = (jnp.abs(ddx) > opt.depth_threshold_for_discontinuity_check) | (
        jnp.abs(ddy) > opt.depth_threshold_for_discontinuity_check
    )
    r = opt.half_dilation_kernel_size_for_discontinuity_map
    if r > 0:
        disc = ~jax.vmap(lambda m: im.erode_mask(~m, r))(disc)
    return _Prepared(gray=gray, dx=dx, dy=dy, depth=depths, mask=valid & ~disc)


def _project(vertices, extrinsic, intrinsic: PinholeCameraIntrinsic):
    g = vertices @ extrinsic[:3, :3].T + extrinsic[:3, 3]
    z = g[:, 2]
    zs = jnp.maximum(z, 1e-6)
    u = g[:, 0] / zs * intrinsic.fx + intrinsic.cx
    v = g[:, 1] / zs * intrinsic.fy + intrinsic.cy
    return g, u, v, z


def _visibility(vertices, prep: _Prepared, extrinsics, intrinsic, opt):
    """(V, N) bool: vertex v visible in camera c (projected depth agrees)."""

    def per_cam(E, depth_img, mask_img):
        g, u, v, z = _project(vertices, E, intrinsic)
        m = int(opt.image_boundary_margin)
        inb = (
            (z > 1e-4)
            & (u >= m)
            & (u < intrinsic.width - m)
            & (v >= m)
            & (v < intrinsic.height - m)
        )
        d_img = im.bilinear_sample(depth_img, jnp.stack([u, v], -1))
        msk = im.bilinear_sample(mask_img.astype(jnp.float32), jnp.stack([u, v], -1))
        ok = (
            inb
            & (d_img > 0)
            & (jnp.abs(d_img - z) < opt.depth_threshold_for_visibility_check)
            & (msk > 0.999)
        )
        return ok

    return jax.vmap(per_cam)(extrinsics, prep.depth, prep.mask).T  # (V, N)


def _proxy_intensity(vertices, prep, extrinsics, intrinsic, vis):
    def per_cam(E, gray):
        _, u, v, _ = _project(vertices, E, intrinsic)
        return im.bilinear_sample(gray, jnp.stack([u, v], -1))

    samples = jax.vmap(per_cam)(extrinsics, prep.gray)  # (N, V)
    w = vis.T.astype(jnp.float32)
    return jnp.sum(samples * w, axis=0) / jnp.maximum(jnp.sum(w, axis=0), 1e-6)


def run_rigid_optimizer(
    vertices: jnp.ndarray,  # (V, 3) mesh vertices (world)
    colors: jnp.ndarray,  # (N, H, W, 3) or (N, H, W) gray
    depths: jnp.ndarray,  # (N, H, W) metric
    extrinsics: jnp.ndarray,  # (N, 4, 4) world->camera
    intrinsic: PinholeCameraIntrinsic,
    option: RigidOptimizerOption = RigidOptimizerOption(),
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(ref: RunRigidOptimizer, RigidOptimizer.cpp:71).

    Returns (vertex_colors (V, 3), extrinsics' (N, 4, 4), residual_history).
    Jit-friendly: the whole loop is lax.fori over a fixed iteration count.
    """
    prep = _prepare_images(colors, depths, option)
    vis = _visibility(vertices, prep, extrinsics, intrinsic, option)

    fx, fy = intrinsic.fx, intrinsic.fy

    def gn_once(extrinsics, proxy):
        def per_cam(E, gray, dxi, dyi, vis_c):
            g, u, v, z = _project(vertices, E, intrinsic)
            uv = jnp.stack([u, v], -1)
            gray_s = im.bilinear_sample(gray, uv)
            dx_s = im.bilinear_sample(dxi, uv)
            dy_s = im.bilinear_sample(dyi, uv)
            invz = 1.0 / jnp.maximum(z, 1e-6)
            v0 = dx_s * fx * invz
            v1 = dy_s * fy * invz
            v2 = -(v0 * g[:, 0] + v1 * g[:, 1]) * invz
            # J wrt [omega, t] (ref: ComputeJacobianAndResidualRigid)
            J = jnp.stack(
                [
                    -g[:, 2] * v1 + g[:, 1] * v2,
                    g[:, 2] * v0 - g[:, 0] * v2,
                    -g[:, 1] * v0 + g[:, 0] * v1,
                    v0,
                    v1,
                    v2,
                ],
                axis=-1,
            )  # (V, 6)
            r = gray_s - proxy
            w = vis_c.astype(jnp.float32)
            JtJ = jnp.einsum("vi,vj,v->ij", J, J, w)
            Jtr = jnp.einsum("vi,v,v->i", J, r, w)
            res = jnp.sum(w * r * r)
            dx6 = jnp.linalg.solve(JtJ + 1e-6 * jnp.eye(6), -Jtr)
            return lie.se3_exp(dx6) @ E, res

        return jax.vmap(per_cam)(extrinsics, prep.gray, prep.dx, prep.dy, vis.T)

    def body(i, carry):
        extr, hist = carry
        proxy = _proxy_intensity(vertices, prep, extr, intrinsic, vis)
        extr, res = gn_once(extr, proxy)
        hist = hist.at[i].set(jnp.sum(res))
        return extr, hist

    hist0 = jnp.zeros((option.maximum_iteration,), jnp.float32)
    extr, hist = jax.lax.fori_loop(0, option.maximum_iteration, body, (extrinsics, hist0))

    vertex_colors = _final_vertex_colors(vertices, colors, extr, intrinsic, vis)
    return vertex_colors, extr, hist


def _final_vertex_colors(vertices, colors, extrinsics, intrinsic, vis):
    if colors.ndim == 3:
        colors3 = jnp.repeat(colors[..., None], 3, axis=-1)
    else:
        colors3 = colors

    def per_cam(E, img):
        _, u, v, _ = _project(vertices, E, intrinsic)
        uv = jnp.stack([u, v], -1)
        return jnp.stack(
            [im.bilinear_sample(img[..., k], uv) for k in range(3)], axis=-1
        )

    samples = jax.vmap(per_cam)(extrinsics, colors3)  # (N, V, 3)
    w = vis.T.astype(jnp.float32)[..., None]
    return jnp.sum(samples * w, axis=0) / jnp.maximum(jnp.sum(w, axis=0), 1e-6)


def run_non_rigid_optimizer(
    vertices: jnp.ndarray,
    colors: jnp.ndarray,
    depths: jnp.ndarray,
    extrinsics: jnp.ndarray,
    intrinsic: PinholeCameraIntrinsic,
    option: NonRigidOptimizerOption = NonRigidOptimizerOption(),
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Non-rigid variant (ref: NonRigidOptimizer.cpp:85): after the rigid
    poses converge, a per-camera image-space warp field (a
    number_of_vertical_anchors-tall control lattice, ImageWarpingField.cpp)
    absorbs residual lens/rolling-shutter error. The warp is optimized by
    the same GN residual with Jacobians through the lattice interpolation;
    anchor regularization keeps it near identity.

    Returns (vertex_colors, extrinsics', warp_fields (N, A, A2, 2))."""
    # rigid first (half the iterations), then warp refinement
    half = dataclasses.replace(
        option, maximum_iteration=max(option.maximum_iteration // 2, 1)
    )
    _, extr, _ = run_rigid_optimizer(
        vertices, colors, depths, extrinsics, intrinsic, half
    )
    prep = _prepare_images(colors, depths, option)
    vis = _visibility(vertices, prep, extr, intrinsic, option)
    proxy = _proxy_intensity(vertices, prep, extr, intrinsic, vis)

    H, W = intrinsic.height, intrinsic.width
    A = int(option.number_of_vertical_anchors)
    A2 = max(int(round(A * W / H)), 2)
    sy = (A - 1) / H
    sx = (A2 - 1) / W
    warp0 = jnp.zeros((extr.shape[0], A, A2, 2), jnp.float32)
    lam = jnp.float32(option.non_rigid_anchor_point_weight)

    def warp_uv(field, u, v):
        """Displace (u, v) by the bilinearly interpolated lattice field."""
        gx = jnp.clip(u * sx, 0.0, A2 - 1.001)
        gy = jnp.clip(v * sy, 0.0, A - 1.001)
        x0 = jnp.floor(gx).astype(jnp.int32)
        y0 = jnp.floor(gy).astype(jnp.int32)
        fxr = gx - x0
        fyr = gy - y0
        d = (
            field[y0, x0] * ((1 - fxr) * (1 - fyr))[:, None]
            + field[y0, x0 + 1] * (fxr * (1 - fyr))[:, None]
            + field[y0 + 1, x0] * ((1 - fxr) * fyr)[:, None]
            + field[y0 + 1, x0 + 1] * (fxr * fyr)[:, None]
        )
        return u + d[:, 0], v + d[:, 1]

    def per_cam_loss(field, E, gray, vis_c):
        g, u, v, z = _project(vertices, E, intrinsic)
        uw, vw = warp_uv(field, u, v)
        gray_s = im.bilinear_sample(gray, jnp.stack([uw, vw], -1))
        r = (gray_s - proxy) * vis_c.astype(jnp.float32)
        return jnp.sum(r * r) + lam * jnp.sum(field * field)

    loss_grad = jax.grad(per_cam_loss)

    def opt_cam(field, E, gray, vis_c):
        def body(i, f):
            gr = loss_grad(f, E, gray, vis_c)
            return f - 0.5 * gr / (jnp.linalg.norm(gr) + 1e-6) * 0.5
        return jax.lax.fori_loop(0, 30, body, field)

    warp = jax.vmap(opt_cam)(warp0, extr, prep.gray, vis.T)

    # final colors sampled through the warp
    if colors.ndim == 3:
        colors3 = jnp.repeat(colors[..., None], 3, axis=-1)
    else:
        colors3 = colors

    def per_cam_color(field, E, img):
        _, u, v, _ = _project(vertices, E, intrinsic)
        uw, vw = warp_uv(field, u, v)
        uv = jnp.stack([uw, vw], -1)
        return jnp.stack(
            [im.bilinear_sample(img[..., k], uv) for k in range(3)], axis=-1
        )

    samples = jax.vmap(per_cam_color)(warp, extr, colors3)
    w = vis.T.astype(jnp.float32)[..., None]
    vertex_colors = jnp.sum(samples * w, axis=0) / jnp.maximum(
        jnp.sum(w, axis=0), 1e-6
    )
    return vertex_colors, extr, warp
