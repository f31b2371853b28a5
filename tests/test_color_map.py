"""Color-map optimization: blurry -> sharp on a synthetic textured plane
(round-2 verdict item #7)."""

import jax
import jax.numpy as jnp
import numpy as np

from open3d_tpu.core import lie
from open3d_tpu.geometry.camera import PinholeCameraIntrinsic
from open3d_tpu.pipelines import color_map as cm


def _texture(x, y):
    return 0.5 + 0.25 * jnp.sin(6.0 * x) * jnp.cos(5.0 * y) + 0.15 * jnp.sin(11.0 * x + 2.0 * y)


def _render(intr, extrinsic):
    """Analytic image of the textured z=0 plane from a camera above it."""
    u = jnp.arange(intr.width, dtype=jnp.float32)[None, :]
    v = jnp.arange(intr.height, dtype=jnp.float32)[:, None]
    x = (jnp.zeros((intr.height, 1)) + u - intr.cx) / intr.fx
    y = (v + jnp.zeros((1, intr.width)) - intr.cy) / intr.fy
    R = extrinsic[:3, :3]
    t = extrinsic[:3, 3]
    origin = -R.T @ t
    dirs = jnp.stack([x, y, jnp.ones_like(x)], -1) @ R  # world dir per unit z
    # intersect z = 0: origin_z + dir_z * s = 0
    s = -origin[2] / dirs[..., 2]
    pw = origin + dirs * s[..., None]
    gray = _texture(pw[..., 0], pw[..., 1])
    depth = s  # camera-frame z distance
    return gray, depth


def _look_down(height, dx=0.0, dy=0.0, tilt=0.0):
    """world->camera extrinsic for a camera at (dx, dy, -height) looking +z."""
    T = np.eye(4, dtype=np.float32)
    c, s = np.cos(tilt), np.sin(tilt)
    T[:3, :3] = np.asarray([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)
    T[:3, 3] = -T[:3, :3] @ np.asarray([dx, dy, -height], np.float32)
    return T


def _setup(n_cams=3, noise=0.01, seed=0):
    intr = PinholeCameraIntrinsic(160, 120, 131.25, 131.25, 79.5, 59.5)
    rng = np.random.default_rng(seed)
    true_extr = [
        _look_down(1.0, dx=0.1 * i - 0.1, dy=0.05 * i) for i in range(n_cams)
    ]
    grays, depths = [], []
    for E in true_extr:
        g, d = _render(intr, jnp.asarray(E))
        grays.append(g)
        depths.append(d)
    # perturbed initial poses (what the optimizer gets)
    bad_extr = []
    for i, E in enumerate(true_extr):
        if i == 0:
            bad_extr.append(E)
            continue
        xi = np.concatenate([rng.normal(0, 0.002, 3), rng.normal(0, noise, 3)])
        bad_extr.append(np.asarray(lie.se3_exp(jnp.asarray(xi, jnp.float32))) @ E)
    # mesh vertices: grid on the plane
    xs = np.linspace(-0.4, 0.4, 24)
    ys = np.linspace(-0.3, 0.3, 18)
    X, Y = np.meshgrid(xs, ys)
    verts = np.stack([X.ravel(), Y.ravel(), np.zeros(X.size)], -1).astype(np.float32)
    return (
        intr,
        jnp.asarray(verts),
        jnp.stack(grays),
        jnp.stack(depths),
        jnp.asarray(np.stack(bad_extr)),
        jnp.asarray(np.stack(true_extr)),
    )


def _proxy_variance(vertices, grays, depths, extr, intr):
    """Mean per-vertex intensity variance across cameras — the blur metric."""
    opt = cm.RigidOptimizerOption()
    prep = cm._prepare_images(grays, depths, opt)
    vis = cm._visibility(vertices, prep, extr, intr, opt)

    def per_cam(E, gray):
        _, u, v, _ = cm._project(vertices, E, intr)
        from open3d_tpu.geometry import image as im

        return im.bilinear_sample(gray, jnp.stack([u, v], -1))

    samples = jax.vmap(per_cam)(extr, prep.gray)
    w = vis.T.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w, 0), 1e-6)
    mean = jnp.sum(samples * w, 0) / n
    var = jnp.sum(w * (samples - mean) ** 2, 0) / n
    seen = np.asarray(jnp.sum(w, 0)) >= 2
    return float(jnp.asarray(var)[seen].mean())


def test_rigid_color_map_sharpens():
    intr, verts, grays, depths, bad, true = _setup()
    var_before = _proxy_variance(verts, grays, depths, bad, intr)
    opt = cm.RigidOptimizerOption(maximum_iteration=30, image_boundary_margin=6)
    colors, extr_out, hist = cm.run_rigid_optimizer(
        verts, grays, depths, bad, intr, opt
    )
    var_after = _proxy_variance(verts, grays, depths, extr_out, intr)
    # the blur metric (cross-camera intensity variance at vertices) is what
    # the optimizer minimizes — it must drop hard
    assert var_after < 0.35 * var_before, (var_before, var_after)
    # residual history decreases
    h = np.asarray(hist)
    assert h[-1] < h[0]
    # absolute poses are recoverable only up to the joint gauge (all cameras
    # may drift coherently along texture-invariant directions); require that
    # they at least do not run away
    for i in range(1, 3):
        d_before = np.linalg.norm(np.asarray(bad[i]) - np.asarray(true[i]))
        d_after = np.linalg.norm(np.asarray(extr_out[i]) - np.asarray(true[i]))
        assert d_after < 1.5 * d_before + 1e-3, (i, d_before, d_after)
    assert colors.shape == (verts.shape[0], 3)


def test_rigid_color_map_perfect_poses_stay():
    intr, verts, grays, depths, _, true = _setup(noise=0.0)
    opt = cm.RigidOptimizerOption(maximum_iteration=5, image_boundary_margin=6)
    _, extr_out, _ = cm.run_rigid_optimizer(verts, grays, depths, true, intr, opt)
    assert float(jnp.max(jnp.abs(extr_out - true))) < 5e-3


def test_non_rigid_runs_and_improves():
    intr, verts, grays, depths, bad, true = _setup()
    opt = cm.NonRigidOptimizerOption(
        maximum_iteration=20, image_boundary_margin=6, number_of_vertical_anchors=8
    )
    colors, extr_out, warp = cm.run_non_rigid_optimizer(
        verts, grays, depths, bad, intr, opt
    )
    assert warp.shape[0] == 3 and warp.shape[-1] == 2
    var_before = _proxy_variance(verts, grays, depths, bad, intr)
    var_after = _proxy_variance(verts, grays, depths, extr_out, intr)
    assert var_after < var_before
