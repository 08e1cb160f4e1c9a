from .actor import ExtractActor
from .pipeline import build_extraction_pipeline, reassemble_mixed

__all__ = [
    "ExtractActor",
    "build_extraction_pipeline",
    "reassemble_mixed",
]
