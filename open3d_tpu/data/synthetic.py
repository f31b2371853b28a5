"""Synthetic RGB-D scenes with exact ground truth.

The reference ships auto-downloading datasets (data/Dataset.h:58 — Redwood
fragments, TUM sequences) that tests and benchmarks consume. This build runs
in a zero-egress environment, so the equivalent subsystem generates scenes
analytically instead: a composable signed-distance scene, exact depth
rendering by sphere tracing (pure jnp), analytic normals via jax.grad, exact
surface sampling for point-cloud tests, and ground-truth camera trajectories
for odometry/SLAM/ATE evaluation.

The default scene is a furnished-room stand-in (walls + sphere + box + a
cylinder column) sized like the Redwood living-room fragments so the same
voxel sizes / ICP radii as the reference configs apply.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from open3d_tpu.geometry.camera import PinholeCameraIntrinsic
from open3d_tpu.geometry.pointcloud import PointCloud

# ---------------------------------------------------------------------------
# SDF primitives (all take (..., 3) -> (...))
# ---------------------------------------------------------------------------


def sd_sphere(p, center, radius):
    return jnp.linalg.norm(p - jnp.asarray(center, jnp.float32), axis=-1) - radius


def sd_box(p, center, half_extents):
    q = jnp.abs(p - jnp.asarray(center, jnp.float32)) - jnp.asarray(half_extents, jnp.float32)
    outside = jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
    inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    return outside + inside


def sd_cylinder_y(p, center, radius, half_height):
    """Vertical (y-axis) capped cylinder."""
    c = jnp.asarray(center, jnp.float32)
    dx = p[..., 0] - c[0]
    dz = p[..., 2] - c[2]
    d_xz = jnp.sqrt(dx * dx + dz * dz) - radius
    d_y = jnp.abs(p[..., 1] - c[1]) - half_height
    outside = jnp.linalg.norm(jnp.maximum(jnp.stack([d_xz, d_y], -1), 0.0), axis=-1)
    inside = jnp.minimum(jnp.maximum(d_xz, d_y), 0.0)
    return outside + inside


def sd_room(p, half_extents):
    """Hollow box (inward-facing walls) centered at origin: the negated box SDF."""
    return -sd_box(p, (0.0, 0.0, 0.0), half_extents)


def default_scene_sdf(p: jnp.ndarray) -> jnp.ndarray:
    """Living-room-scale scene: 5x3x5 m room with a sphere, a box 'table' and
    a cylinder 'column'. Camera space convention: y down (consistent with the
    pinhole model in geometry/image.py), world y down too; floor at y=+1.5."""
    d = sd_room(p, (2.5, 1.5, 2.5))
    d = jnp.minimum(d, sd_sphere(p, (0.8, 0.9, 0.4), 0.5))
    d = jnp.minimum(d, sd_box(p, (-0.9, 1.1, -0.6), (0.5, 0.4, 0.35)))
    d = jnp.minimum(d, sd_cylinder_y(p, (-0.2, 0.5, 1.2), 0.3, 1.0))
    d = jnp.minimum(d, sd_box(p, (1.6, 1.25, -1.4), (0.35, 0.25, 0.6)))
    return d


def scene_color(p: jnp.ndarray) -> jnp.ndarray:
    """Deterministic smooth pseudo-texture in [0,1]^3 — gives the photometric
    terms (colored ICP, intensity odometry) real gradients to lock onto.
    Two frequency bands: the low band alone leaves the photometric 6-DOF
    landscape information-starved (spurious minima ~2 cm from GT); the mid
    band supplies the constraint real-world texture would."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    r = 0.5 + 0.35 * jnp.sin(3.1 * x + 1.7 * z) + 0.15 * jnp.sin(9.0 * x + 5.0 * y)
    g = 0.5 + 0.35 * jnp.sin(2.3 * y + 0.9 * x + 2.0) + 0.15 * jnp.sin(8.0 * z + 6.0 * x)
    b = 0.5 + 0.35 * jnp.sin(2.9 * z + 1.3 * y + 4.0) + 0.15 * jnp.sin(7.0 * y + 5.5 * z)
    return jnp.clip(
        jnp.stack([0.25 + 0.5 * r, 0.25 + 0.5 * g, 0.25 + 0.5 * b], axis=-1), 0.0, 1.0
    )


def sdf_normal(sdf: Callable, p: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """Central-difference SDF gradient, normalized."""
    offs = jnp.eye(3, dtype=jnp.float32) * eps
    g = jnp.stack([(sdf(p + offs[i]) - sdf(p - offs[i])) / (2 * eps) for i in range(3)], axis=-1)
    return g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)


# ---------------------------------------------------------------------------
# Rendering: sphere tracing
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0, 2))
def _render_rays(sdf, origins_dirs, n_steps: int):
    origins, dirs = origins_dirs

    def body(i, t):
        p = origins + t[..., None] * dirs
        return t + sdf(p)

    t = jax.lax.fori_loop(0, n_steps, body, jnp.full(origins.shape[:-1], 0.05, jnp.float32))

    # Newton refinement along the ray: sphere tracing converges only linearly
    # near the surface (and slower at grazing angles), and the residual offset
    # is viewpoint-dependent — it biases photometric odometry between frames.
    def newton(i, t):
        p = origins + t[..., None] * dirs
        g = sdf_normal(sdf, p)
        dd = jnp.sum(g * dirs, axis=-1)
        step = sdf(p) / jnp.where(jnp.abs(dd) < 0.1, jnp.sign(dd) * 0.1 + (dd == 0), dd)
        return t + jnp.clip(step, -0.05, 0.05)

    t = jax.lax.fori_loop(0, 3, newton, t)
    return t


def render_depth(
    sdf: Callable,
    intrinsic: PinholeCameraIntrinsic,
    extrinsic: jnp.ndarray,
    depth_max: float = 8.0,
    n_steps: int = 96,
    with_color: bool = True,
):
    """Render (depth (H, W) f32, color (H, W, 3) f32) from a world->camera
    extrinsic by sphere-tracing the scene SDF. Depth is the pinhole z-depth.
    Pixels that escape the scene get depth 0 (invalid), like real sensors."""
    H, W = intrinsic.height, intrinsic.width
    u = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(H, 0)
    v = jnp.arange(H, dtype=jnp.float32)[:, None].repeat(W, 1)
    rays_cam = jnp.stack(
        [(u - intrinsic.cx) / intrinsic.fx, (v - intrinsic.cy) / intrinsic.fy, jnp.ones_like(u)],
        axis=-1,
    )
    R = extrinsic[:3, :3]
    t = extrinsic[:3, 3]
    cam_center = -R.T @ t
    dirs_w = rays_cam @ R  # R^T applied row-wise
    dir_norm = jnp.linalg.norm(dirs_w, axis=-1, keepdims=True)
    dirs_n = dirs_w / dir_norm
    origins = jnp.broadcast_to(cam_center, dirs_n.shape)

    ray_t = _render_rays(sdf, (origins, dirs_n), n_steps)
    p_hit = origins + ray_t[..., None] * dirs_n
    hit = (jnp.abs(sdf(p_hit)) < 2e-3) & (ray_t > 0.0)
    # z-depth = ray length / |dir_w per unit z|
    z = ray_t / dir_norm[..., 0]
    depth = jnp.where(hit & (z < depth_max) & (z > 0.05), z, 0.0)
    if not with_color:
        return depth, None
    color = jnp.where(hit[..., None], scene_color(p_hit), 0.0)
    return depth, color


# ---------------------------------------------------------------------------
# Surface sampling (for registration tests)
# ---------------------------------------------------------------------------


def sample_surface(
    sdf: Callable,
    key,
    n_points: int,
    bound: float = 2.4,
    n_newton: int = 30,
    capacity: int | None = None,
    with_normals: bool = True,
    with_colors: bool = False,
) -> PointCloud:
    """Sample ~uniform points on the SDF zero level set by projecting random
    volume points along the gradient (Newton iterations p <- p - sdf(p) n(p))."""
    p = jax.random.uniform(key, (n_points, 3), minval=-bound, maxval=bound).astype(jnp.float32)

    def body(i, p):
        d = sdf(p)
        n = sdf_normal(sdf, p)
        return p - (d * 0.9)[..., None] * n

    p = jax.lax.fori_loop(0, n_newton, body, p)
    ok = jnp.abs(sdf(p)) < 1e-3
    attrs = {}
    if with_normals:
        attrs["normals"] = sdf_normal(sdf, p)
    if with_colors:
        attrs["colors"] = scene_color(p)
    return PointCloud.create(p, capacity=capacity or n_points, mask=ok, **attrs)


# ---------------------------------------------------------------------------
# Trajectories
# ---------------------------------------------------------------------------


def look_at(eye, target, up=(0.0, -1.0, 0.0)) -> jnp.ndarray:
    """World->camera extrinsic with +z forward, y down (sensor convention)."""
    eye = jnp.asarray(eye, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    fwd = target - eye
    fwd = fwd / jnp.maximum(jnp.linalg.norm(fwd), 1e-9)
    right = jnp.cross(up, fwd)
    right = right / jnp.maximum(jnp.linalg.norm(right), 1e-9)
    down = jnp.cross(fwd, right)
    R = jnp.stack([right, down, fwd], axis=0)  # world->cam rows
    t = -R @ eye
    T = jnp.eye(4, dtype=jnp.float32).at[:3, :3].set(R).at[:3, 3].set(t)
    return T


def orbit_trajectory(n_frames: int, radius: float = 1.4, height: float = 0.2, span: float = 1.2):
    """Smooth orbit inside the default room, looking at scene center.
    Returns (n_frames, 4, 4) world->camera extrinsics."""
    s = jnp.linspace(0.0, span, n_frames)
    eyes = jnp.stack(
        [radius * jnp.cos(s), height + 0.15 * jnp.sin(2.0 * s), radius * jnp.sin(s)], axis=-1
    )
    targets = jnp.stack([0.2 * jnp.sin(s), 0.8 + 0.0 * s, 0.2 * jnp.cos(s)], axis=-1)
    return jax.vmap(look_at)(eyes, targets)


def render_sequence(
    n_frames: int,
    intrinsic: PinholeCameraIntrinsic | None = None,
    sdf: Callable = default_scene_sdf,
    depth_noise: float = 0.0,
    key=None,
    **traj_kwargs,
):
    """Render an RGB-D sequence with GT world->camera poses. Returns
    (depths (F, H, W), colors (F, H, W, 3), extrinsics (F, 4, 4))."""
    if intrinsic is None:
        intrinsic = PinholeCameraIntrinsic(160, 120, 131.25, 131.25, 79.5, 59.5)
    extr = orbit_trajectory(n_frames, **traj_kwargs)
    depths, colors = [], []
    for i in range(n_frames):
        d, c = render_depth(sdf, intrinsic, extr[i])
        if depth_noise > 0.0 and key is not None:
            key, sub = jax.random.split(key)
            noise = depth_noise * d * jax.random.normal(sub, d.shape)
            d = jnp.where(d > 0, d + noise, 0.0)
        depths.append(d)
        colors.append(c)
    return jnp.stack(depths), jnp.stack(colors), extr, intrinsic
