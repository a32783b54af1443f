from .profiling import ThroughputMeter, stage_timer, trace_to
from .logging import get_logger
from .reliability import deterministic_check, with_oom_downshift

__all__ = [
    "ThroughputMeter",
    "stage_timer",
    "trace_to",
    "get_logger",
    "deterministic_check",
    "with_oom_downshift",
]
