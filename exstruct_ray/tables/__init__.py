from .detect import detect_tables

__all__ = ["detect_tables"]
