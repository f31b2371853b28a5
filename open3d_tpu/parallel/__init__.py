"""Device-mesh parallelism: the TPU-native replacement for the reference's
multiprocessing.Pool fragment scaling (SURVEY.md §2.13)."""

from open3d_tpu.parallel.fragments import (  # noqa: F401
    make_mesh,
    multiway_align,
    multiway_gn_step,
)
