from .events import EventWriter
from .profiling import device_memory_stats, trace

__all__ = ["EventWriter", "device_memory_stats", "trace"]
