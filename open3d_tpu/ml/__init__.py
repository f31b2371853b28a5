"""open3d_tpu.ml — 3D machine-learning ops (ref: cpp/open3d/ml/, SURVEY.md §2.10).

The reference registers these as TF/PyTorch custom CUDA ops; here they are
plain jax functions (jit/vmap/grad-compatible), so they compose with any JAX
model without framework glue.
"""

from open3d_tpu.ml import ops  # noqa: F401
