"""Distributed reconstruction pipeline stages over a TPU device mesh.

The reference scales its offline reconstruction system with a
multiprocessing.Pool over fragments and fragment pairs
(examples/python/reconstruction_system/make_fragments.py:180-186,
register_fragments.py:167-171). The TPU-native equivalent is data
parallelism over a 1-D `jax.sharding.Mesh` axis "fragments":

- STAGE 1 `make_fragments_sharded`: the frame sequence is split into
  fixed-size fragments, the (F, T, H, W) stacks are sharded over the mesh,
  and each device runs the full per-fragment chain — odometry scan ->
  TSDF integration scan -> surface extraction — on its local fragments
  with `lax.map` (identical math to the host pipeline's
  `_process_single_fragment`, minus the per-fragment pose-graph relaxation).
- STAGE 2 `register_pairs_sharded`: candidate fragment pairs are sharded
  over the same axis; each device runs the on-device ICP `while_loop` +
  information matrix on its local pairs and the results are all-gathered.
- STAGE 3 is `parallel.fragments.multiway_gn_step` (the ("edges",
  "points") 2-D mesh joint Gauss-Newton), already sharded.

Everything is shape-static: fragments are padded to a multiple of the mesh
axis (padded entries carry valid=False and are dropped by callers), so any
F / E works on any mesh size.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from open3d_tpu.core import lie
from open3d_tpu.geometry import voxel_block_grid as vbg_mod
from open3d_tpu.geometry.camera import PinholeCameraIntrinsic
from open3d_tpu.geometry.pointcloud import PointCloud
from open3d_tpu.geometry.rgbd import RGBDImage
from open3d_tpu.pipelines import odometry as odo
from open3d_tpu.pipelines import registration as reg


def make_pipeline_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh with axis "fragments" (stage-1/2 data parallelism)."""
    if devices is None:
        devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]), ("fragments",))


def _pad_to_multiple(x: jnp.ndarray, m: int, fill=0):
    n = x.shape[0]
    pad = (-n) % m
    if pad == 0:
        return x
    return jnp.concatenate(
        [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], axis=0
    )


class FragmentBatch(NamedTuple):
    """Stage-1 output: fixed-capacity fragment clouds + per-frame poses."""

    positions: jnp.ndarray  # (F, P, 3)
    normals: jnp.ndarray  # (F, P, 3)
    mask: jnp.ndarray  # (F, P) bool
    poses: jnp.ndarray  # (F, T, 4, 4) frame -> fragment frame
    valid: jnp.ndarray  # (F,) bool — False for padding fragments


def _fragment_chain(
    dep,  # (T, H, W) metric depth, 0 invalid
    col,  # (T, H, W, 3)
    intrinsic: PinholeCameraIntrinsic,
    voxel_size: float,
    block_count: int,
    block_resolution: int,
    point_capacity: int,
    depth_max: float,
    frame_block_capacity: int,
    ok: jnp.ndarray,  # scalar bool: real fragment?
):
    """Odometry chain -> TSDF integrate -> extract, fully jittable.

    (ref: make_fragments.py:60-147 — the per-fragment pose graph with
    keyframe loop closures is replaced by the plain odometry chain here;
    fragments are short enough that drift within one fragment is handled by
    the stage-3 joint alignment.)
    """
    eye = jnp.eye(4, dtype=jnp.float32)

    def odo_step(pose_prev, frame):
        d0, c0, d1, c1 = frame
        res = odo.rgbd_odometry_multi_scale(
            RGBDImage(color=c0, depth=d0), RGBDImage(color=c1, depth=d1), intrinsic
        )
        # tgt_pt = T @ src_pt  ->  pose_{i+1} = pose_i @ inv(T)
        pose = pose_prev @ lie.invert_se3(res.transformation)
        return pose, pose

    _, poses_rest = jax.lax.scan(odo_step, eye, (dep[:-1], col[:-1], dep[1:], col[1:]))
    poses = jnp.concatenate([eye[None], poses_rest], axis=0)  # (T, 4, 4)

    vbg0 = vbg_mod.create(
        voxel_size=voxel_size,
        block_resolution=block_resolution,
        block_count=block_count,
        with_color=True,
    )

    def integ(vbg, frame):
        d, c, pose = frame
        extr = lie.invert_se3(pose)
        keys, _ = vbg_mod.compute_unique_block_coordinates(
            vbg, d, intrinsic, extr, depth_max=depth_max,
            frame_block_capacity=frame_block_capacity,
        )
        vbg = vbg_mod.integrate(
            vbg, keys, d, c, intrinsic, extr, depth_max=depth_max, use_pallas=False
        )
        return vbg, None

    # padding fragments integrate nothing (depth zeroed -> no touched blocks)
    dep = jnp.where(ok, dep, 0.0)
    vbg, _ = jax.lax.scan(integ, vbg0, (dep, col, poses))
    pcd = vbg_mod.extract_point_cloud(
        vbg, point_capacity=point_capacity, weight_threshold=2.0
    )
    return (
        pcd.positions,
        pcd.attrs["normals"],
        pcd.mask & ok,
        poses,
    )


def make_fragments_sharded(
    depths: jnp.ndarray,  # (F, T, H, W) metric float32, 0 = invalid
    colors: jnp.ndarray,  # (F, T, H, W, 3)
    intrinsic: PinholeCameraIntrinsic,
    mesh: Mesh,
    voxel_size: float = 0.01,
    block_count: int = 4096,
    block_resolution: int = 8,
    point_capacity: int = 32768,
    depth_max: float = 3.0,
    frame_block_capacity: int = 2048,
) -> FragmentBatch:
    """Stage 1, sharded: each device builds its fragments end-to-end.

    Fragments are padded to a multiple of the mesh axis; padded entries
    return valid=False and empty clouds.
    """
    F = depths.shape[0]
    n_dev = mesh.shape["fragments"]
    valid = _pad_to_multiple(jnp.ones((F,), bool), n_dev, False)
    depths = _pad_to_multiple(depths, n_dev)
    colors = _pad_to_multiple(colors, n_dev)

    def local(dep_l, col_l, ok_l):
        def one(args):
            dep, col, ok = args
            return _fragment_chain(
                dep, col, intrinsic, voxel_size, block_count, block_resolution,
                point_capacity, depth_max, frame_block_capacity, ok,
            )
        return jax.lax.map(one, (dep_l, col_l, ok_l))

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("fragments"), P("fragments"), P("fragments")),
        out_specs=P("fragments"),
        check_vma=False,
    )
    pos, nrm, msk, poses = fn(depths, colors, valid)
    return FragmentBatch(
        positions=pos, normals=nrm, mask=msk, poses=poses, valid=valid
    )


class PairRegistrationBatch(NamedTuple):
    """Stage-2 output, one row per candidate pair (padded rows valid=False)."""

    transformations: jnp.ndarray  # (E, 4, 4) src -> tgt
    informations: jnp.ndarray  # (E, 6, 6)
    fitness: jnp.ndarray  # (E,)
    inlier_rmse: jnp.ndarray  # (E,)
    valid: jnp.ndarray  # (E,) bool


def register_pairs_sharded(
    fragments: FragmentBatch,
    pairs: jnp.ndarray,  # (E, 2) int32 (src_fragment, tgt_fragment)
    mesh: Mesh,
    max_correspondence_distance: float,
    pair_valid: Optional[jnp.ndarray] = None,
    init: Optional[jnp.ndarray] = None,  # (E, 4, 4) initial guesses
    max_iteration: int = 30,
) -> PairRegistrationBatch:
    """Stage 2, sharded: ICP + information matrix per candidate pair
    (ref: register_fragments.py:40-99 register_point_cloud_pair; the Pool
    fan-out of :167-171 becomes mesh data parallelism)."""
    E = pairs.shape[0]
    n_dev = mesh.shape["fragments"]
    pv = jnp.ones((E,), bool) if pair_valid is None else pair_valid
    pv = _pad_to_multiple(pv, n_dev, False)
    pairs = _pad_to_multiple(pairs, n_dev)
    if init is None:
        init = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (E, 4, 4))
    init = _pad_to_multiple(init, n_dev)
    # padding rows must stay a valid pose (identity), not zeros
    init = jnp.where(pv[:, None, None], init, jnp.eye(4, dtype=jnp.float32))

    est = reg.TransformationEstimationPointToPlane()
    crit = reg.ICPConvergenceCriteria(max_iteration=max_iteration)

    def local(pairs_l, pv_l, init_l, pos_r, nrm_r, msk_r):
        def one(args):
            pair, v, T0 = args
            src = PointCloud(
                positions=pos_r[pair[0]], mask=msk_r[pair[0]] & v, attrs={}
            )
            tgt = PointCloud(
                positions=pos_r[pair[1]],
                mask=msk_r[pair[1]] & v,
                attrs={"normals": nrm_r[pair[1]]},
            )
            res = reg.icp(
                src, tgt, max_correspondence_distance,
                init=T0, estimation=est, criteria=crit,
            )
            info = reg.get_information_matrix(
                src, tgt, max_correspondence_distance, res.transformation
            )
            return res.transformation, info, res.fitness, res.inlier_rmse

        outs = jax.lax.map(one, (pairs_l, pv_l, init_l))
        return jax.tree.map(
            lambda x: jax.lax.all_gather(x, "fragments", axis=0, tiled=True), outs
        )

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("fragments"), P("fragments"), P("fragments"), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    T, info, fit, rmse = fn(
        pairs, pv, init, fragments.positions, fragments.normals, fragments.mask
    )
    return PairRegistrationBatch(
        transformations=T, informations=info, fitness=fit, inlier_rmse=rmse, valid=pv
    )
