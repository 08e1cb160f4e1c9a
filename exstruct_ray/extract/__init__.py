from .document import extract_document_spans, extract_workbook

__all__ = ["extract_document_spans", "extract_workbook"]
