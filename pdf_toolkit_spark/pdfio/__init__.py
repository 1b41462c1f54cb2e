"""Pure-Python PDF container I/O.

``writer`` emits deterministic, minimal PDF 1.4 byte streams (the
fixture corpus generator); ``parser`` walks a PDF's xref table, parses
objects lazily, and tokenizes content streams — the "xref/object-stream
walk, content-stream tokenizer" parse path of the extraction pipeline.
The reference delegates this to PyMuPDF (``fitz.open``,
/root/reference/src/pdf-toolkit/render.py:89); this engine owns the
parse so the Arrow-batched UDF has no native dependencies.
"""

from .writer import PageSpec, write_pdf
from .parser import PdfDocument, ParsedPage

__all__ = ["PageSpec", "write_pdf", "PdfDocument", "ParsedPage"]
