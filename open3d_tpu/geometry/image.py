"""Dense image ops for RGB-D processing.

Reference: t/geometry/Image.h:29 + kernels in t/geometry/kernel/Image*.
Images here are plain jnp arrays — depth (H, W) float32 in meters with 0.0
marking invalid pixels (the reference uses 0/NaN the same way), color
(H, W, 3) float32 in [0, 1], intensity (H, W) float32.

Everything is pure elementwise/conv math that XLA fuses well on the VPU;
no Pallas needed at these sizes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from open3d_tpu.geometry.camera import PinholeCameraIntrinsic


def clip_transform(depth_raw, depth_scale: float, depth_min: float, depth_max: float):
    """uint16/float raw depth -> metric float depth; out-of-range -> 0
    (ref: Image::ClipTransform, t/geometry/kernel/ImageImpl.h)."""
    d = depth_raw.astype(jnp.float32) / depth_scale
    valid = (d > depth_min) & (d < depth_max)
    return jnp.where(valid, d, 0.0)


def rgb_to_gray(color):
    """(H, W, 3) -> (H, W) using ITU-R BT.601 weights (ref: Image::RGBToGray)."""
    w = jnp.array([0.299, 0.587, 0.114], dtype=color.dtype)
    return color @ w


def _shift2d(img, dy: int, dx: int, fill=0.0):
    """Shift an (H, W[, C]) image; vacated pixels get `fill`."""
    out = jnp.roll(img, (dy, dx), axis=(0, 1))
    H, W = img.shape[0], img.shape[1]
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    valid = (yy >= dy) & (yy < H + dy) & (xx >= dx) & (xx < W + dx)
    if img.ndim == 3:
        valid = valid[..., None]
    return jnp.where(valid, out, fill)


def filter_gaussian(img, kernel_size: int = 3, sigma: float = 1.0):
    """Separable Gaussian blur (ref: Image::FilterGaussian; NPP/IPP backed)."""
    r = kernel_size // 2
    x = jnp.arange(-r, r + 1, dtype=jnp.float32)
    k = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    k = k / jnp.sum(k)
    squeeze = img.ndim == 2
    data = img[..., None] if squeeze else img
    out = jnp.zeros_like(data)
    for i, wy in enumerate(k):
        row = jnp.zeros_like(data)
        for j, wx in enumerate(k):
            row = row + wx * _shift2d(data, i - r, j - r, fill=0.0)
        out = out + wy * row
    # renormalize at borders using the same stencil over an all-ones image
    ones = jnp.ones(data.shape[:2] + (1,), dtype=data.dtype)
    norm = jnp.zeros_like(ones)
    for i, wy in enumerate(k):
        for j, wx in enumerate(k):
            norm = norm + wy * wx * _shift2d(ones, i - r, j - r, fill=0.0)
    out = out / jnp.maximum(norm, 1e-8)
    return out[..., 0] if squeeze else out


def filter_bilateral_depth(depth, kernel_size: int = 5, sigma_space: float = 2.0, sigma_depth: float = 0.05):
    """Edge-preserving bilateral filter for depth; invalid (0) pixels neither
    contribute nor get filled (ref: Image::FilterBilateral)."""
    r = kernel_size // 2
    num = jnp.zeros_like(depth)
    den = jnp.zeros_like(depth)
    inv2ss = 1.0 / (2.0 * sigma_space * sigma_space)
    inv2sd = 1.0 / (2.0 * sigma_depth * sigma_depth)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            nb = _shift2d(depth, dy, dx, fill=0.0)
            w_s = jnp.exp(-(dy * dy + dx * dx) * inv2ss)
            diff = nb - depth
            w = w_s * jnp.exp(-(diff * diff) * inv2sd) * (nb > 0.0)
            num = num + w * nb
            den = den + w
    out = num / jnp.maximum(den, 1e-8)
    return jnp.where(depth > 0.0, out, 0.0)


def filter_sobel(img):
    """Returns (dx, dy) Sobel gradients of an (H, W) image (ref: Image::FilterSobel)."""
    kx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=jnp.float32) / 8.0
    ky = kx.T
    dx = jnp.zeros_like(img)
    dy = jnp.zeros_like(img)
    for i in range(3):
        for j in range(3):
            # correlation (no kernel flip): s(y, x) = img(y + i - 1, x + j - 1)
            s = _shift2d(img, -(i - 1), -(j - 1), fill=0.0)
            dx = dx + kx[i, j] * s
            dy = dy + ky[i, j] * s
    return dx, dy


def erode_mask(mask, radius: int = 1):
    """Binary erosion with a (2r+1)^2 square structuring element; border
    counts as invalid. Used to reject gradient stencils that touch invalid
    pixels (the reference gets this for free by using NaN for invalid depth —
    NaN poisons the Sobel stencil; with 0-as-invalid we must gate explicitly)."""
    out = mask
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if dy == 0 and dx == 0:
                continue
            out = out & _shift2d(mask, dy, dx, fill=False)
    return out


def pyrdown(img):
    """Gaussian blur + 2x decimation (ref: Image::PyrDown)."""
    return filter_gaussian(img, kernel_size=5, sigma=1.0)[::2, ::2]


def pyrdown_depth(depth, diff_threshold: float = 0.07):
    """Depth-aware pyrdown (ref: Image::PyrDownDepth): smooth only over valid
    neighbors whose depth is within `diff_threshold` of the center, then 2x
    decimate; invalid stays invalid."""
    r = 2
    x = jnp.arange(-r, r + 1, dtype=jnp.float32)
    k1 = jnp.exp(-(x * x) / 2.0)
    k1 = k1 / jnp.sum(k1)
    num = jnp.zeros_like(depth)
    den = jnp.zeros_like(depth)
    for i in range(5):
        for j in range(5):
            nb = _shift2d(depth, i - r, j - r, fill=0.0)
            w = k1[i] * k1[j] * (nb > 0.0) * (jnp.abs(nb - depth) < diff_threshold)
            num = num + w * nb
            den = den + w
    smoothed = jnp.where(depth > 0.0, num / jnp.maximum(den, 1e-8), 0.0)
    return smoothed[::2, ::2]


def create_vertex_map(depth, intrinsic: PinholeCameraIntrinsic):
    """(H, W) depth -> (H, W, 3) camera-frame vertex map; invalid -> 0
    (ref: Image::CreateVertexMap)."""
    H, W = depth.shape
    u = jnp.arange(W, dtype=jnp.float32)[None, :]
    v = jnp.arange(H, dtype=jnp.float32)[:, None]
    x = (u - intrinsic.cx) / intrinsic.fx * depth
    y = (v - intrinsic.cy) / intrinsic.fy * depth
    vm = jnp.stack([x, y, depth], axis=-1)
    return jnp.where((depth > 0.0)[..., None], vm, 0.0)


def create_normal_map(vertex_map):
    """(H, W, 3) vertex map -> (H, W, 3) normal map via central differences +
    cross product; invalid -> 0 (ref: Image::CreateNormalMap)."""
    vz = vertex_map[..., 2]
    valid_c = vz > 0.0
    right = _shift2d(vertex_map, 0, -1)
    down = _shift2d(vertex_map, -1, 0)
    valid = valid_c & (right[..., 2] > 0.0) & (down[..., 2] > 0.0)
    dx = right - vertex_map
    dy = down - vertex_map
    n = jnp.cross(dx, dy)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(norm, 1e-12)
    # orient towards camera (-z viewing direction): n . v < 0
    flip = jnp.sum(n * vertex_map, axis=-1, keepdims=True) > 0.0
    n = jnp.where(flip, -n, n)
    return jnp.where(valid[..., None], n, 0.0)


def colorize_depth(depth, depth_scale: float = 1.0, depth_min: float = 0.0, depth_max: float = 3.0):
    """Depth -> turbo-ish RGB for debugging (ref: Image::ColorizeDepth)."""
    d = jnp.clip((depth / depth_scale - depth_min) / max(depth_max - depth_min, 1e-6), 0.0, 1.0)
    r = jnp.clip(1.5 - jnp.abs(2.0 * d - 1.5), 0.0, 1.0)
    g = jnp.clip(1.5 - jnp.abs(2.0 * d - 1.0), 0.0, 1.0)
    b = jnp.clip(1.5 - jnp.abs(2.0 * d - 0.5), 0.0, 1.0)
    return jnp.stack([r, g, b], axis=-1)


def bilinear_sample(img, uv, valid_fill=0.0):
    """Bilinearly sample (H, W[, C]) `img` at float pixel coords uv (..., 2)
    = (u=x, v=y). Out-of-bounds -> valid_fill. Used by projective data
    association in odometry and colored-ICP."""
    H, W = img.shape[0], img.shape[1]
    u = uv[..., 0]
    v = uv[..., 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = (u - u0)[..., None] if img.ndim == 3 else u - u0
    dv = (v - v0)[..., None] if img.ndim == 3 else v - v0
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)

    def gather(vi, ui):
        vi_c = jnp.clip(vi, 0, H - 1)
        ui_c = jnp.clip(ui, 0, W - 1)
        return img[vi_c, ui_c]

    g00 = gather(v0i, u0i)
    g01 = gather(v0i, u0i + 1)
    g10 = gather(v0i + 1, u0i)
    g11 = gather(v0i + 1, u0i + 1)
    top = g00 * (1 - du) + g01 * du
    bot = g10 * (1 - du) + g11 * du
    out = top * (1 - dv) + bot * dv
    inb = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)
    if img.ndim == 3:
        inb = inb[..., None]
    return jnp.where(inb, out, valid_fill)


def bilinear_sample_with_grad(img, uv):
    """Sample an (H, W) or (H, W, C) image bilinearly and return
    (value, d/du, d/dv) — the EXACT partial derivatives of the bilinear
    interpolant. Gauss-Newton on a bilinear residual needs this
    consistency: with a smoothed (Sobel-map) gradient the fixed point of
    J^T W r = 0 is displaced from the true cost minimum. Out-of-bounds
    samples return 0 everywhere.

    Multi-channel inputs share one set of corner gathers — pack the images
    a warp needs (e.g. depth + intensity) into the channel axis: gathers
    use FLAT linearized row indices, which lower ~9x faster than 2-D
    gathers on TPU, and C channels ride the same 4 row gathers."""
    H, W = img.shape[0], img.shape[1]
    multi = img.ndim == 3
    flat = img.reshape(H * W, -1) if multi else img.reshape(H * W)
    u = uv[..., 0]
    v = uv[..., 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = u - u0
    dv = v - v0
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)

    def gather(vi, ui):
        lin = jnp.clip(vi, 0, H - 1) * W + jnp.clip(ui, 0, W - 1)
        return flat[lin]

    g00 = gather(v0i, u0i)
    g01 = gather(v0i, u0i + 1)
    g10 = gather(v0i + 1, u0i)
    g11 = gather(v0i + 1, u0i + 1)
    if multi:
        du = du[..., None]
        dv = dv[..., None]
    val = (g00 * (1 - du) + g01 * du) * (1 - dv) + (g10 * (1 - du) + g11 * du) * dv
    gu = (g01 - g00) * (1 - dv) + (g11 - g10) * dv
    gv = (g10 - g00) * (1 - du) + (g11 - g01) * du
    inb = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)
    if multi:
        inb = inb[..., None]
    z = jnp.zeros_like(val)
    return jnp.where(inb, val, z), jnp.where(inb, gu, z), jnp.where(inb, gv, z)


def build_intensity_pyramid(color, levels: int):
    gray = rgb_to_gray(color) if color.ndim == 3 else color
    pyr = [gray]
    for _ in range(levels - 1):
        pyr.append(pyrdown(pyr[-1]))
    return pyr


def build_depth_pyramid(depth, levels: int, diff_threshold: float = 0.07):
    pyr = [depth]
    for _ in range(levels - 1):
        pyr.append(pyrdown_depth(pyr[-1], diff_threshold))
    return pyr


def build_normal_pyramid(normals, levels: int):
    """(H, W, 3) unit-normal pyramid: 2x2 mean + renormalize per level
    (zero rows stay zero = invalid). Feeds odometry when the caller has a
    better normal map than the vertex-map cross products (e.g. the
    raycaster's TSDF-gradient normals, VoxelBlockGrid.cpp:354-367)."""
    pyr = [normals]
    for _ in range(levels - 1):
        n = pyr[-1]
        H2, W2 = n.shape[0] // 2, n.shape[1] // 2
        m = n[: 2 * H2, : 2 * W2].reshape(H2, 2, W2, 2, 3).mean(axis=(1, 3))
        norm = jnp.linalg.norm(m, axis=-1, keepdims=True)
        pyr.append(jnp.where(norm > 0.3, m / jnp.maximum(norm, 1e-9), 0.0))
    return pyr


def linear_transform(img, scale: float = 1.0, offset: float = 0.0):
    """img * scale + offset (ref: Image::LinearTransform, Image.h:161)."""
    return img * scale + offset


def dilate(img, kernel_size: int = 3):
    """Grayscale dilation: max over the kernel_size window per channel
    (ref: Image::Dilate, Image.h:196 / kernel/Image*). Static-shift max
    stencil — the same idiom as erode_mask/filter_gaussian."""
    r = kernel_size // 2
    out = img
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            if dy == 0 and dx == 0:
                continue
            out = jnp.maximum(out, _shift2d(img, dy, dx, fill=-jnp.inf))
    return jnp.where(jnp.isfinite(out), out, img)
