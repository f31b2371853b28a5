from open3d_tpu.data import synthetic  # noqa: F401
