"""open3d_tpu.visualization — host-side viewer bridge + debug rendering.

The reference's visualization stack (58k LoC of Filament/GLSL/ImGui,
SURVEY.md §2.11) is host rendering infrastructure with no TPU equivalent to
build; the TPU-native story (SURVEY.md §2.7 "TPU build") is a thin client
that ships geometry to any viewer speaking the reference's msgpack-over-ZeroMQ
RPC protocol (io/rpc/Messages.h), plus matplotlib/plotly debug rendering.
"""

from open3d_tpu.visualization.rpc import (  # noqa: F401
    BufferConnection,
    Connection,
    set_mesh_data,
    set_point_cloud,
    set_triangle_mesh,
)
