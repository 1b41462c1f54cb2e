"""Page-selection / page-range parsing and deterministic naming helpers.

Semantics match the reference 1:1 (strict, fail-early parsing):
- parse_page_spec   -> /root/reference/src/pdf-toolkit/utils.py:93-161
- parse_page_ranges -> utils.py:164-233
- chunk_ranges      -> split.py:28-42  (the mega-PDF salting primitive)
- page/part digits  -> render.py:27-37, split.py:45-48

Unlike the reference, the two spec parsers share one token scanner; the
error conditions and messages' meaning are preserved (tests pin them).
"""

from __future__ import annotations

from .errors import UserError


def ensure_has_pages(total_pages: int) -> None:
    if total_pages <= 0:
        raise UserError("PDF has no pages.")


def validate_positive_int(value: int, label: str) -> int:
    if value <= 0:
        raise UserError(f"{label} must be a positive integer.")
    return value


def validate_degrees(degrees: int) -> int:
    """Only 90/180/270 clockwise are supported (utils.py:81-90)."""

    if degrees not in {90, 180, 270}:
        raise UserError("Degrees must be one of 90, 180, 270 (clockwise).")
    return degrees


def _scan_tokens(spec: str, what: str) -> list[tuple[int, int]]:
    """Tokenize "1-3,5,7-9" into 1-based inclusive (start, end) pairs."""

    raw = spec.strip()
    if not raw:
        raise UserError(f"{what} selection is empty.")
    compact = raw.replace(" ", "")
    tokens = compact.split(",")
    if any(t == "" for t in tokens):
        raise UserError(f"{what} selection contains an empty token (check commas).")

    pairs: list[tuple[int, int]] = []
    for token in tokens:
        if "-" in token:
            parts = token.split("-")
            if len(parts) != 2 or not parts[0] or not parts[1] or not (
                parts[0].isdigit() and parts[1].isdigit()
            ):
                raise UserError(f"Invalid range '{token}'. Use formats like 1-3 or 5.")
            start, end = int(parts[0]), int(parts[1])
        else:
            if not token.isdigit():
                raise UserError(f"Invalid page token '{token}'. Use formats like 1 or 2-4.")
            start = end = int(token)
        if start < 1 or end < 1:
            raise UserError("Page numbers are 1-based and must be >= 1.")
        if start > end:
            raise UserError(f"Invalid range '{token}': start > end.")
        pairs.append((start, end))
    return pairs


def parse_page_spec(spec: str, total_pages: int) -> list[int]:
    """Parse "all" / "1-3,5,7-9" into zero-based page indices.

    Strict: rejects empty tokens, non-digits, start>end, out-of-range
    pages, and duplicates (utils.py:93-161).
    """

    ensure_has_pages(total_pages)
    compact = spec.strip().replace(" ", "")
    if compact.lower() in {"all", "*"}:
        return list(range(total_pages))

    pages: list[int] = []
    seen: set[int] = set()
    for start, end in _scan_tokens(spec, "Page"):
        for page_number in range(start, end + 1):
            if page_number > total_pages:
                raise UserError(
                    f"Page {page_number} is out of range. PDF has {total_pages} pages."
                )
            if page_number in seen:
                raise UserError(f"Duplicate page {page_number} in selection.")
            seen.add(page_number)
            pages.append(page_number - 1)
    if not pages:
        raise UserError("Page selection produced no pages.")
    return pages


def parse_page_ranges(spec: str, total_pages: int) -> list[tuple[int, int]]:
    """Parse "1-120,121-240" into zero-based inclusive (start, end)
    tuples; overlapping ranges are rejected (utils.py:164-233)."""

    ensure_has_pages(total_pages)
    compact = spec.strip().replace(" ", "")
    if compact.lower() in {"all", "*"}:
        raise UserError("Use explicit ranges like 1-120,121-240 or pages_per_chunk.")

    ranges: list[tuple[int, int]] = []
    seen: set[int] = set()
    for start, end in _scan_tokens(spec, "Ranges"):
        for page_number in range(start, end + 1):
            if page_number > total_pages:
                raise UserError(
                    f"Page {page_number} is out of range. PDF has {total_pages} pages."
                )
            if page_number in seen:
                raise UserError(
                    f"Ranges overlap on page {page_number}. Overlaps are not allowed."
                )
            seen.add(page_number)
        ranges.append((start - 1, end - 1))
    if not ranges:
        raise UserError("Ranges selection produced no pages.")
    return ranges


def chunk_ranges(total_pages: int, pages_per_chunk: int) -> list[tuple[int, int]]:
    """Zero-based inclusive (start, end) chunks covering all pages.

    E.g. 10 pages by 3 -> [(0,2), (3,5), (6,8), (9,9)] (split.py:28-42).
    This is the in-plan salt for skewed mega-PDFs: one fat doc explodes
    into N chunk rows processed in parallel and regrouped by doc_id.
    """

    validate_positive_int(pages_per_chunk, "pages_per_chunk")
    return [
        (start, min(start + pages_per_chunk - 1, total_pages - 1))
        for start in range(0, total_pages, pages_per_chunk)
    ]


def compute_page_digits(page_numbers: list[int]) -> int:
    """Zero-pad width for sortable page names like p0001 (render.py:27-37)."""

    if not page_numbers:
        return 4
    return max(4, len(str(max(page_numbers))))


def compute_part_digits(num_parts: int) -> int:
    """Zero-pad width for part names like part01 (split.py:45-48)."""

    return max(2, len(str(num_parts)))
