"""open3d_tpu — a TPU-native 3D reconstruction / dense RGB-D SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
isl-org/Open3D (reference: /root/reference, v0.19.0), built TPU-first:

- geometry containers are JAX pytrees with fixed-capacity buffers + validity
  masks (XLA needs static shapes),
- nearest-neighbor search rides the MXU (tiled GEMM distance kernels) instead
  of KD-trees,
- the TSDF voxel-block grid is an open-addressing hash table over HBM tensors,
- Gauss-Newton reductions (ICP / odometry) are J^T J matmuls on the MXU,
- multi-host scaling uses jax.sharding meshes + shard_map collectives instead
  of multiprocessing pools.

Layout (mirrors the reference's layer map, SURVEY.md section 1):
  core/       device-independent math substrate: SE(3), small linalg, hashmap,
              nearest-neighbor search, masking idioms          (ref: cpp/open3d/core)
  geometry/   PointCloud, Image, RGBDImage, TriangleMesh, VoxelBlockGrid,
              camera models                                    (ref: cpp/open3d/t/geometry)
  ops/        Pallas TPU kernels for the hot paths
  pipelines/  registration (ICP/RANSAC/FGR/FPFH), odometry, pose-graph
              optimization, integration                        (ref: cpp/open3d/t/pipelines)
  models/     flagship drivers: dense SLAM (frame-to-model), offline
              reconstruction system                            (ref: examples/.../t_reconstruction_system)
  parallel/   device meshes, sharded fragment processing, distributed solves
  io/         PLY/PCD/PNG/npz codecs, pose-graph JSON, TUM trajectories
  data/       synthetic dataset generators (analytic SDF scenes w/ GT poses)
  utils/      logging, timers, configs
"""

__version__ = "0.1.0"

from open3d_tpu import core, geometry, pipelines, utils  # noqa: F401
