from linevis_tpu.scene.filters import (  # noqa: F401
    LineFilter,
    LineLengthFilter,
    MaxLineAttributeFilter,
)
from linevis_tpu.scene.line_data import LineData, LineDataFlow  # noqa: F401
from linevis_tpu.scene.line_data_stress import LineDataStress  # noqa: F401
