"""Datasets: cache layout, RGB-D sequence loaders, synthetic demo data.

Reference surface: data/Dataset.h:58 + DownloadDataset (download -> MD5
verify -> extract into ~/open3d_data/{download,extract}/<name>,
Dataset.h:40-50) and the ~44 dataset classes in data/dataset/ (e.g.
DemoICPPointClouds — 3 Redwood living-room fragments; LoungeRGBDImages;
RedwoodIndoorLivingRoom1 with GT trajectory; SampleTUMRGBDImage).

TPU build: identical cache layout under $OPEN3D_TPU_DATA_ROOT (default
~/.open3d_tpu/data). This environment has no network egress, so
`download()` verifies/uses a pre-populated cache and otherwise raises with
instructions; every demo dataset has a synthetic fallback rendered from the
analytic scene so tests and benchmarks run hermetically.
"""

from __future__ import annotations

import dataclasses
import hashlib
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np


def data_root() -> str:
    root = os.environ.get("OPEN3D_TPU_DATA_ROOT", os.path.expanduser("~/.open3d_tpu/data"))
    os.makedirs(root, exist_ok=True)
    return root


def _md5(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


class Dataset:
    """Base dataset: prefix + cache paths (ref: data/Dataset.h:58)."""

    def __init__(self, prefix: str, data_root_path: Optional[str] = None):
        self.prefix = prefix
        self.root = data_root_path or data_root()
        self.download_dir = os.path.join(self.root, "download", prefix)
        self.extract_dir = os.path.join(self.root, "extract", prefix)


class DownloadDataset(Dataset):
    """Download -> MD5 -> extract pipeline (ref: data/Dataset.h
    DownloadDataset). With no egress, only the cache/extract path works."""

    def __init__(self, prefix: str, url: str, md5: str, data_root_path=None):
        super().__init__(prefix, data_root_path)
        self.url = url
        self.md5 = md5

    def fetch(self) -> str:
        """Return the extract dir, downloading/extracting if needed."""
        if os.path.isdir(self.extract_dir) and os.listdir(self.extract_dir):
            return self.extract_dir
        archive = os.path.join(self.download_dir, os.path.basename(self.url))
        if os.path.isfile(archive):
            if self.md5 and _md5(archive) != self.md5:
                raise RuntimeError(f"MD5 mismatch for {archive}")
            self._extract(archive)
            return self.extract_dir
        try:
            import urllib.request

            os.makedirs(self.download_dir, exist_ok=True)
            urllib.request.urlretrieve(self.url, archive)
            if self.md5 and _md5(archive) != self.md5:
                raise RuntimeError(f"MD5 mismatch for {archive}")
            self._extract(archive)
            return self.extract_dir
        except Exception as e:  # no egress in this environment
            raise RuntimeError(
                f"dataset '{self.prefix}' not cached and download failed ({e}); "
                f"place the archive at {archive} or the extracted data at "
                f"{self.extract_dir}"
            )

    def _extract(self, archive: str) -> None:
        import shutil

        os.makedirs(self.extract_dir, exist_ok=True)
        shutil.unpack_archive(archive, self.extract_dir)


# ---------------------------------------------------------------------------
# RGB-D sequence abstraction
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class RGBDSequence:
    """A loaded RGB-D trajectory: file lists + intrinsics + conventions."""

    color_paths: List[str]
    depth_paths: List[str]
    depth_scale: float
    intrinsic: "object"  # PinholeCameraIntrinsic
    gt_trajectory: Optional[np.ndarray] = None  # (N, 4, 4) cam->world
    timestamps: Optional[np.ndarray] = None

    def __len__(self) -> int:
        return len(self.depth_paths)

    def read_frame(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (depth_metric_f32 (H, W), color_f32 (H, W, 3) in [0,1])."""
        from open3d_tpu.io import read_depth, read_image

        depth = read_depth(self.depth_paths[i], self.depth_scale)
        color = read_image(self.color_paths[i]).astype(np.float32) / 255.0
        return depth, color

    def iter_frames(self, n_threads: int = 4, depth_ahead: int = 8):
        """Prefetched frame stream: the native threaded read-ahead loader
        overlaps disk IO + PNG decode with device compute (the TPU-native
        equivalent of the reference's multiprocessing frame pools,
        make_fragments.py:180-186)."""
        import io as _io

        from PIL import Image

        from open3d_tpu.native import FilePrefetcher

        order = [p for pair in zip(self.depth_paths, self.color_paths) for p in pair]
        with FilePrefetcher(order, n_threads=n_threads, depth=depth_ahead) as pf:
            for i in range(len(self)):
                db = pf.get(2 * i)
                cb = pf.get(2 * i + 1)
                dimg = Image.open(_io.BytesIO(db))
                d = np.asarray(dimg, dtype=np.uint16 if dimg.mode in ("I", "I;16", "I;16B") else np.uint8)
                depth = d.astype(np.float32) / self.depth_scale
                color = np.asarray(Image.open(_io.BytesIO(cb)).convert("RGB"), np.uint8).astype(np.float32) / 255.0
                yield depth, color


def load_tum_sequence(root: str, max_depth_diff: float = 0.02) -> RGBDSequence:
    """TUM RGB-D layout: rgb.txt / depth.txt / groundtruth.txt with
    timestamp association (ref convention: geometry/RGBDImageFactory.cpp
    CreateFromTUMFormat — depth scale 5000)."""
    from open3d_tpu.geometry.camera import PinholeCameraIntrinsic
    from open3d_tpu.io import read_trajectory_tum

    def read_list(name):
        out = []
        with open(os.path.join(root, name)) as f:
            for ln in f:
                ln = ln.strip()
                if not ln or ln.startswith("#"):
                    continue
                t, p = ln.split()[:2]
                out.append((float(t), os.path.join(root, p)))
        return out

    rgb = read_list("rgb.txt")
    depth = read_list("depth.txt")
    # associate nearest timestamps
    pairs = []
    j = 0
    for t, cp in rgb:
        while j + 1 < len(depth) and abs(depth[j + 1][0] - t) <= abs(depth[j][0] - t):
            j += 1
        if abs(depth[j][0] - t) < max_depth_diff:
            pairs.append((t, cp, depth[j][1]))
    gt = None
    ts = np.asarray([p[0] for p in pairs])
    gt_file = os.path.join(root, "groundtruth.txt")
    if os.path.isfile(gt_file):
        gts, gtp = read_trajectory_tum(gt_file)
        # nearest GT pose per associated frame
        idx = np.searchsorted(gts, ts)
        idx = np.clip(idx, 0, len(gts) - 1)
        gt = gtp[idx]
    # TUM freiburg1 intrinsics (the standard calibrated values), unless the
    # sequence carries its own calibration file (written by
    # write_tum_sequence for non-fr1 cameras)
    calib = os.path.join(root, "intrinsic.txt")
    if os.path.isfile(calib):
        w, h, fx, fy, cx, cy = open(calib).read().split()
        intr = PinholeCameraIntrinsic(
            int(w), int(h), float(fx), float(fy), float(cx), float(cy)
        )
    else:
        intr = PinholeCameraIntrinsic(640, 480, 517.3, 516.5, 318.6, 255.3)
    return RGBDSequence(
        color_paths=[p[1] for p in pairs],
        depth_paths=[p[2] for p in pairs],
        depth_scale=5000.0,
        intrinsic=intr,
        gt_trajectory=gt,
        timestamps=ts,
    )


def write_tum_sequence(
    root: str,
    depths,  # (N, H, W) metric float
    colors,  # (N, H, W, 3) float [0, 1]
    trajectory,  # (N, 4, 4) camera->world ground truth
    intrinsic=None,
    depth_scale: float = 5000.0,
    fps: float = 30.0,
) -> str:
    """Write frames to disk in the exact TUM RGB-D benchmark layout
    (rgb/ + depth/ 16-bit PNGs, rgb.txt / depth.txt / groundtruth.txt with
    quaternion poses) so `load_tum_sequence` + run_system exercise the SAME
    code path as real fr1/desk data. See DATA.md for the real-data status."""
    import numpy as np

    from open3d_tpu.io import write_depth, write_image
    from open3d_tpu.io.trajectory import write_trajectory_tum

    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    n = len(depths)
    ts = np.arange(n, dtype=np.float64) / fps
    with open(os.path.join(root, "rgb.txt"), "w") as fr, open(
        os.path.join(root, "depth.txt"), "w"
    ) as fd:
        fr.write("# color images\n# timestamp filename\n")
        fd.write("# depth maps\n# timestamp filename\n")
        for i in range(n):
            rgb_rel = f"rgb/{ts[i]:.6f}.png"
            dep_rel = f"depth/{ts[i]:.6f}.png"
            write_image(
                os.path.join(root, rgb_rel),
                (np.clip(np.asarray(colors[i]), 0, 1) * 255).astype(np.uint8),
            )
            write_depth(
                os.path.join(root, dep_rel), np.asarray(depths[i]), depth_scale
            )
            fr.write(f"{ts[i]:.6f} {rgb_rel}\n")
            fd.write(f"{ts[i]:.6f} {dep_rel}\n")
    write_trajectory_tum(
        os.path.join(root, "groundtruth.txt"), np.asarray(trajectory), ts
    )
    if intrinsic is not None:
        with open(os.path.join(root, "intrinsic.txt"), "w") as fi:
            fi.write(
                f"{intrinsic.width} {intrinsic.height} {intrinsic.fx} "
                f"{intrinsic.fy} {intrinsic.cx} {intrinsic.cy}\n"
            )
    return root


def load_redwood_sequence(root: str) -> RGBDSequence:
    """Redwood indoor layout: image/ + depth/ sorted pairs, depth scale 1000
    (ref: RedwoodIndoor* datasets, data/dataset/RedwoodIndoorLivingRoom1.cpp)."""
    from open3d_tpu.geometry.camera import PinholeCameraIntrinsic

    def listdir(sub):
        d = os.path.join(root, sub)
        return sorted(
            os.path.join(d, f) for f in os.listdir(d) if f.lower().endswith((".png", ".jpg"))
        )

    color = listdir("image") if os.path.isdir(os.path.join(root, "image")) else listdir("color")
    depth = listdir("depth")
    n = min(len(color), len(depth))
    intr = PinholeCameraIntrinsic(640, 480, 525.0, 525.0, 319.5, 239.5)  # PrimeSense default
    gt = None
    for name in ("trajectory.log", "livingroom.log", "pose.log"):
        p = os.path.join(root, name)
        if os.path.isfile(p):
            from open3d_tpu.io import read_trajectory_log

            gt = read_trajectory_log(p)
            break
    return RGBDSequence(
        color_paths=color[:n],
        depth_paths=depth[:n],
        depth_scale=1000.0,
        intrinsic=intr,
        gt_trajectory=gt,
    )


# ---------------------------------------------------------------------------
# Synthetic demo datasets (hermetic stand-ins for the download classes)
# ---------------------------------------------------------------------------


def synthetic_rgbd_sequence(
    n_frames: int = 20,
    width: int = 320,
    height: int = 240,
    span: float = 1.2,
    out_dir: Optional[str] = None,
) -> RGBDSequence:
    """Render the analytic scene to PNG files in the dataset cache — a
    hermetic equivalent of LoungeRGBDImages/SampleRedwoodRGBDImages."""
    import jax

    from open3d_tpu.data import synthetic
    from open3d_tpu.geometry.camera import PinholeCameraIntrinsic
    from open3d_tpu.io import write_depth, write_image

    intr = PinholeCameraIntrinsic(
        width, height, 0.82 * width, 0.82 * width, (width - 1) / 2.0, (height - 1) / 2.0
    )
    out_dir = out_dir or os.path.join(data_root(), "extract", f"SyntheticRGBD_{n_frames}_{width}")
    depth_dir = os.path.join(out_dir, "depth")
    color_dir = os.path.join(out_dir, "color")
    done = os.path.join(out_dir, ".done")
    if not os.path.isfile(done):
        os.makedirs(depth_dir, exist_ok=True)
        os.makedirs(color_dir, exist_ok=True)
        depths, colors, extrinsics, _ = synthetic.render_sequence(
            n_frames, intrinsic=intr, span=span
        )
        depths = np.asarray(depths)
        colors = np.asarray(colors)
        poses = np.linalg.inv(np.asarray(extrinsics))  # cam->world
        for i in range(n_frames):
            write_depth(os.path.join(depth_dir, f"{i:06d}.png"), depths[i], 1000.0)
            write_image(
                os.path.join(color_dir, f"{i:06d}.png"),
                (np.clip(colors[i], 0, 1) * 255).astype(np.uint8),
            )
        np.save(os.path.join(out_dir, "gt_poses.npy"), poses)
        with open(done, "w") as f:
            f.write("ok")
    gt = np.load(os.path.join(out_dir, "gt_poses.npy"))
    return RGBDSequence(
        color_paths=[os.path.join(color_dir, f"{i:06d}.png") for i in range(n_frames)],
        depth_paths=[os.path.join(depth_dir, f"{i:06d}.png") for i in range(n_frames)],
        depth_scale=1000.0,
        intrinsic=intr,
        gt_trajectory=gt,
    )


def demo_icp_point_clouds(n_points: int = 20000):
    """Two overlapping surface-sample fragments with a known relative pose —
    the hermetic DemoICPPointClouds (ref: data/dataset/DemoICPPointClouds.cpp
    serves 3 Redwood fragments for ICP tests/benchmarks)."""
    import jax
    import jax.numpy as jnp

    from open3d_tpu.core import lie
    from open3d_tpu.data import synthetic

    src = synthetic.sample_surface(
        synthetic.default_scene_sdf, jax.random.PRNGKey(0), n_points, with_normals=True
    )
    tgt = synthetic.sample_surface(
        synthetic.default_scene_sdf, jax.random.PRNGKey(1), n_points, with_normals=True
    )
    T = lie.se3_exp(jnp.asarray([0.04, -0.03, 0.05, 0.06, -0.04, 0.08], jnp.float32))
    return src, tgt.transform(T), T


# dataset registry mirroring the reference's class names -> loaders
TUM_URLS = {
    "SampleTUMRGBDImage": "https://github.com/isl-org/open3d_downloads/releases/download/20220301-data/SampleTUMRGBDImage.zip",
}
