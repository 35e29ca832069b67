from linevis_tpu.trace.fields import (  # noqa: F401
    tornado_velocity,
    abc_flow_velocity,
    sample_grid_trilinear,
    make_tornado_grid,
    make_abc_flow_grid,
)
from linevis_tpu.trace.streamline import (  # noqa: F401
    StreamlineTracingSettings,
    trace_streamlines,
    trace_streamlines_grid,
    seed_points_volume,
    seed_points_plane,
)
