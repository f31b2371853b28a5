"""`open3d-tpu` command line tool (ref: python/tools/cli.py — `open3d
example ...` / `open3d draw`; plus the reconstruction drivers under
examples/python/t_reconstruction_system/).

Subcommands:
  convert       point-cloud / mesh format conversion (ConvertPointCloud.cpp)
  reconstruct   offline reconstruction system on a dataset directory
  slam          dense SLAM over a sequence, writes trajectory + mesh
  bench         run the benchmark suite (bench.py)
  info          print geometry file statistics (ViewGeometry.cpp analog)
  draw          render a geometry to PNG / send to an RPC viewer
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _load_sequence(path: str):
    from open3d_tpu.data import dataset as ds

    if os.path.isfile(os.path.join(path, "rgb.txt")):
        return ds.load_tum_sequence(path)
    return ds.load_redwood_sequence(path)


def cmd_convert(args):
    from open3d_tpu.io import (
        read_point_cloud,
        read_triangle_mesh,
        write_point_cloud,
        write_triangle_mesh,
    )

    mesh_exts = (".stl", ".off", ".obj", ".glb", ".gltf")
    is_mesh = args.src.lower().endswith(mesh_exts) or args.dst.lower().endswith(
        mesh_exts
    )
    if is_mesh and not args.points:
        mesh = read_triangle_mesh(args.src)
        write_triangle_mesh(args.dst, mesh)
    else:
        pcd = read_point_cloud(args.src)
        if args.voxel_down_sample:
            from open3d_tpu.ops import pointcloud as pc_ops

            pcd = pc_ops.voxel_down_sample(pcd, args.voxel_down_sample)
        write_point_cloud(args.dst, pcd)
    print(f"wrote {args.dst}")


def cmd_info(args):
    import numpy as np

    path = args.path.lower()
    if path.endswith((".stl", ".off", ".obj", ".glb", ".gltf")):
        from open3d_tpu.io import read_triangle_mesh

        m = read_triangle_mesh(args.path)
        v, t = m.compact()
        lo, hi = np.min(np.asarray(v), 0), np.max(np.asarray(v), 0)
        print(f"TriangleMesh: {len(v)} vertices, {len(t)} triangles")
        print(f"  bounds: min {lo.tolist()} max {hi.tolist()}")
    else:
        from open3d_tpu.io import read_point_cloud

        p = read_point_cloud(args.path)
        pts = p.to_numpy()["positions"]
        print(f"PointCloud: {len(pts)} points, attrs: {sorted(p.attrs)}")
        if len(pts):
            print(f"  bounds: min {pts.min(0).tolist()} max {pts.max(0).tolist()}")


def cmd_reconstruct(args):
    from open3d_tpu.pipelines import reconstruction as rc

    seq = _load_sequence(args.dataset)
    if args.config:
        import dataclasses

        cfg = dataclasses.replace(
            rc.ReconstructionConfig.from_yaml(args.config), path_output=args.output
        )
    else:
        cfg = rc.ReconstructionConfig(path_output=args.output)
    mesh = None
    if args.mesh_devices > 1:
        from open3d_tpu.parallel import multihost, pipeline as pp

        multihost.initialize()
        mesh = pp.make_pipeline_mesh(args.mesh_devices)
    vbg, traj, graph = rc.run_system(seq, cfg, mesh=mesh)
    print(f"trajectory + artifacts under {cfg.path_output}")
    if seq.gt_trajectory is not None:
        ate = rc.absolute_trajectory_error(traj, seq.gt_trajectory)
        print(f"ATE RMSE: {ate:.4f} m")


def cmd_slam(args):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from functools import partial

    from open3d_tpu.geometry import voxel_block_grid as vbg_mod
    from open3d_tpu.io import write_trajectory_log, write_triangle_mesh
    from open3d_tpu.models import dense_slam

    seq = _load_sequence(args.dataset)
    cfg = dense_slam.SLAMConfig(voxel_size=args.voxel_size)
    model = dense_slam.create_model(cfg)

    @partial(jax.jit, donate_argnums=(0,))
    def step(model, depth, color, md):
        return dense_slam.slam_step(model, depth, color, md, seq.intrinsic)

    md = None
    poses = []
    n = len(seq) if args.frames <= 0 else min(args.frames, len(seq))
    for i in range(n):
        depth, color = seq.read_frame(i)
        depth = jnp.asarray(depth)
        depth = jnp.where((depth > 0) & (depth < cfg.depth_max), depth, 0.0)
        if md is None:
            md = jnp.zeros_like(depth)
        res = step(model, depth, jnp.asarray(color), md)
        model, md = res.model, res.raycast_depth
        poses.append(np.asarray(model.T_frame_to_world))
        if i % 10 == 0:
            print(f"frame {i}/{n} fitness {float(res.fitness):.3f}")
    os.makedirs(args.output, exist_ok=True)
    write_trajectory_log(os.path.join(args.output, "trajectory.log"), np.stack(poses))
    mesh = vbg_mod.extract_triangle_mesh(model.vbg)
    write_triangle_mesh(os.path.join(args.output, "mesh.ply"), mesh)
    print(f"wrote {args.output}/trajectory.log and mesh.ply")


def cmd_bench(args):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(__file__))))
    import bench

    bench.main()


def cmd_draw(args):
    from open3d_tpu.io import read_point_cloud
    from open3d_tpu.visualization import draw as vis

    pcd = read_point_cloud(args.path)
    if args.rpc:
        from open3d_tpu.visualization.draw import ExternalVisualizer

        ev = ExternalVisualizer(args.rpc)
        ev.set(pcd, path=os.path.basename(args.path))
        print(f"sent to {args.rpc}")
    else:
        out = args.output or (os.path.splitext(args.path)[0] + ".png")
        vis.draw([pcd], output_path=out)
        print(f"wrote {out}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="open3d-tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("convert", help="convert point cloud / mesh formats")
    c.add_argument("src")
    c.add_argument("dst")
    c.add_argument("--voxel-down-sample", type=float, default=0.0)
    c.add_argument("--points", action="store_true", help="force point-cloud mode")
    c.set_defaults(fn=cmd_convert)

    c = sub.add_parser("info", help="print geometry statistics")
    c.add_argument("path")
    c.set_defaults(fn=cmd_info)

    c = sub.add_parser("reconstruct", help="offline reconstruction system")
    c.add_argument("dataset")
    c.add_argument("--output", default="recon_out")
    c.add_argument("--config", default="")
    c.add_argument("--mesh-devices", type=int, default=1)
    c.set_defaults(fn=cmd_reconstruct)

    c = sub.add_parser("slam", help="dense SLAM over a sequence")
    c.add_argument("dataset")
    c.add_argument("--output", default="slam_out")
    c.add_argument("--voxel-size", type=float, default=3.0 / 512)
    c.add_argument("--frames", type=int, default=0)
    c.set_defaults(fn=cmd_slam)

    c = sub.add_parser("bench", help="run the benchmark suite")
    c.set_defaults(fn=cmd_bench)

    c = sub.add_parser("draw", help="render to PNG or send to RPC viewer")
    c.add_argument("path")
    c.add_argument("--output", default="")
    c.add_argument("--rpc", default="")
    c.set_defaults(fn=cmd_draw)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
