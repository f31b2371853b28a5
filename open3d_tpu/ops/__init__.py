from open3d_tpu.ops import pointcloud  # noqa: F401
