from linevis_tpu.geometry.frames import compute_tangents, parallel_transport_frames  # noqa: F401
from linevis_tpu.geometry.tubes import TubeMesh, build_tube_triangle_mesh  # noqa: F401
from linevis_tpu.geometry.segments import LineSegments, build_line_segments  # noqa: F401
