from .builder import WorkbookBuilder
from .corpus import generate_corpus_table, write_corpus_parquet

__all__ = ["WorkbookBuilder", "generate_corpus_table", "write_corpus_parquet"]
