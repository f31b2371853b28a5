"""Gaussian-splat .splat codec (antimatter15 layout).

Reference: t/io/file_format/FileSPLAT.cpp — 32 bytes per gaussian:
3 x f32 position, 3 x f32 LINEAR scale, 4 x u8 color (RGB from the SH DC
coefficient via 0.5 + SH_C0 * f_dc, A = sigmoid(opacity logit)), 4 x u8
rotation quaternion ((q + 1) * 128, wxyz). Writes sort by volume x
opacity descending (FileSPLAT.cpp:48-76), reads recover f_dc / logit
opacity / normalized quats — the same attr names the reference's tensor
map uses (f_dc, opacity, scale, rot).

Host-side numpy codec feeding the fixed-capacity PointCloud pytree, like
the other io modules.
"""

from __future__ import annotations

import numpy as np

_SH_C0 = 0.28209479177387814
_REC_BYTES = 32


def read_splat(path: str, capacity: int | None = None):
    """Read a .splat file -> PointCloud with attrs f_dc (N, 3), opacity
    (N, 1), scale (N, 3), rot (N, 4) (ref: ReadPointCloudFromSPLAT)."""
    import jax.numpy as jnp

    from open3d_tpu.geometry.pointcloud import PointCloud

    raw = np.fromfile(path, dtype=np.uint8)
    n = raw.size // _REC_BYTES
    rec = raw[: n * _REC_BYTES].reshape(n, _REC_BYTES)
    pos = rec[:, 0:12].copy().view(np.float32).reshape(n, 3)
    scale = rec[:, 12:24].copy().view(np.float32).reshape(n, 3)
    color = rec[:, 24:28].astype(np.float32)
    rot_u8 = rec[:, 28:32].astype(np.float32)

    f_dc = ((color[:, :3] / 255.0) - 0.5) / _SH_C0
    a = color[:, 3]
    opacity = np.where(
        a <= 0.0,
        -np.inf,
        np.where(a >= 255.0, np.inf, -np.log(255.0 / np.maximum(a, 1e-6) - 1.0)),
    ).astype(np.float32)[:, None]
    # clamp the saturated logits like a float pipeline would expect
    opacity = np.clip(opacity, -30.0, 30.0)

    q = rot_u8 / 128.0 - 1.0  # wxyz
    norm = np.linalg.norm(q, axis=1, keepdims=True)
    q = np.where(norm > 1e-7, q / np.maximum(norm, 1e-7), [1.0, 0.0, 0.0, 0.0])

    return PointCloud.create(
        jnp.asarray(pos),
        capacity=capacity,
        f_dc=jnp.asarray(f_dc),
        opacity=jnp.asarray(opacity),
        scale=jnp.asarray(scale),
        rot=jnp.asarray(q.astype(np.float32)),
    )


def write_splat(path: str, pcd) -> None:
    """Write a gaussian-splat PointCloud (attrs f_dc, opacity, scale, rot)
    to .splat (ref: WritePointCloudToSPLAT): gaussians sorted by
    volume * opacity descending so progressive viewers draw the dominant
    splats first."""
    mask = np.asarray(pcd.mask)
    pos = np.asarray(pcd.positions)[mask].astype(np.float32)
    f_dc = np.asarray(pcd.attrs["f_dc"])[mask].astype(np.float32)
    opacity = np.asarray(pcd.attrs["opacity"])[mask].astype(np.float32).reshape(-1)
    scale = np.asarray(pcd.attrs["scale"])[mask].astype(np.float32)
    rot = np.asarray(pcd.attrs["rot"])[mask].astype(np.float32)
    n = pos.shape[0]

    vol = scale[:, 0] * scale[:, 1] * scale[:, 2]
    sig = 1.0 / (1.0 + np.exp(-opacity))
    order = np.argsort(-(vol * sig), kind="stable")

    rgb = np.clip(np.round((0.5 + _SH_C0 * f_dc) * 255.0), 0, 255)
    a = np.clip(np.round(sig * 255.0), 0, 255)
    color = np.concatenate([rgb, a[:, None]], axis=1).astype(np.uint8)
    qn = rot / np.maximum(np.linalg.norm(rot, axis=1, keepdims=True), 1e-7)
    rot_u8 = np.clip(np.round((qn + 1.0) * 128.0), 0, 255).astype(np.uint8)

    rec = np.zeros((n, _REC_BYTES), np.uint8)
    rec[:, 0:12] = np.ascontiguousarray(pos[order]).view(np.uint8).reshape(n, 12)
    rec[:, 12:24] = np.ascontiguousarray(scale[order]).view(np.uint8).reshape(n, 12)
    rec[:, 24:28] = color[order]
    rec[:, 28:32] = rot_u8[order]
    rec.tofile(path)
