"""Byte-level OOXML part parsers (stdlib ElementTree, no openpyxl)."""

from .package import VirtualPackage
from .workbook_parser import parse_workbook
from .sheet_parser import SheetGrid, parse_sheet
from .styles import Stylesheet, parse_styles

__all__ = [
    "SheetGrid",
    "Stylesheet",
    "VirtualPackage",
    "parse_sheet",
    "parse_styles",
    "parse_workbook",
]
