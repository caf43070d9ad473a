from .logging import get_logger, log_trace_stats

__all__ = ["get_logger", "log_trace_stats"]
