from open3d_tpu.geometry.camera import (  # noqa: F401
    PinholeCameraIntrinsic,
    PinholeCameraParameters,
    PinholeCameraTrajectory,
)
from open3d_tpu.geometry.pointcloud import PointCloud  # noqa: F401
from open3d_tpu.geometry.rgbd import (  # noqa: F401
    RGBDImage,
    pointcloud_from_depth,
    pointcloud_from_rgbd,
    project_to_rgbd,
)
from open3d_tpu.geometry import image  # noqa: F401
from open3d_tpu.geometry.bounding_volume import (  # noqa: F401
    AxisAlignedBoundingBox,
    OrientedBoundingBox,
)
from open3d_tpu.geometry.lineset import LineSet  # noqa: F401
