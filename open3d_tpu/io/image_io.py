"""Image IO: PNG/JPG via PIL, incl. 16-bit depth PNGs (TUM/Redwood format).

Reference surface: io/ImageIO.cpp + t/io/ImageIO.cpp (libpng/libjpeg-turbo).
"""

from __future__ import annotations

import numpy as np


def read_image(path: str) -> np.ndarray:
    """uint8 (H, W, 3) color or uint16/uint8 (H, W) grayscale/depth."""
    from PIL import Image

    img = Image.open(path)
    if img.mode in ("I", "I;16", "I;16B"):
        return np.asarray(img, dtype=np.uint16)
    if img.mode == "L":
        return np.asarray(img, dtype=np.uint8)
    return np.asarray(img.convert("RGB"), dtype=np.uint8)


def write_image(path: str, img: np.ndarray) -> None:
    from PIL import Image

    img = np.asarray(img)
    if img.dtype == np.uint16:
        Image.fromarray(img.astype(np.int32), mode="I").convert("I;16").save(path)
    else:
        Image.fromarray(img).save(path)


def read_depth(path: str, depth_scale: float = 1000.0) -> np.ndarray:
    """Metric float32 depth from a 16-bit PNG (TUM scale 5000, Redwood 1000;
    ref: geometry/RGBDImageFactory.cpp dataset conventions)."""
    d = read_image(path).astype(np.float32) / depth_scale
    return d


def write_depth(path: str, depth: np.ndarray, depth_scale: float = 1000.0) -> None:
    d = np.clip(np.asarray(depth, np.float64) * depth_scale, 0, 65535).astype(np.uint16)
    write_image(path, d)
