from open3d_tpu.core import lie, linalg, masking  # noqa: F401
from open3d_tpu.core.masking import FAR_COORD  # noqa: F401
