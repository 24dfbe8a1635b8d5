from change3d_tpu.utils.logging import MetricLogger, setup_logger
from change3d_tpu.utils.profiling import StepTimer, trace_context

__all__ = ["MetricLogger", "setup_logger", "StepTimer", "trace_context"]
