from open3d_tpu.pipelines import registration, robust_kernels  # noqa: F401
