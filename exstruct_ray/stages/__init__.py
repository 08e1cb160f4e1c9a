from .actor import ExtractActor
from .pipeline import build_extraction_pipeline, explode_giant_docs, reassemble_exploded

__all__ = [
    "ExtractActor",
    "build_extraction_pipeline",
    "explode_giant_docs",
    "reassemble_exploded",
]
