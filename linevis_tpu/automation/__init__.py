from linevis_tpu.automation.replay import ReplayWidget  # noqa: F401
from linevis_tpu.automation.perf import AutomaticPerformanceMeasurer, InternalState  # noqa: F401
