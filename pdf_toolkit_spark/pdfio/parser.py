"""Minimal, lazy PDF reader: xref walk + object parser + content-stream
tokenizer.

This is the engine-owned replacement for the reference's
``fitz.open(pdf_path)`` (render.py:89, split.py:96, rotate.py:97): it
exposes ``page_count`` cheaply (xref + pages tree only) and parses
individual pages on demand — which is what makes mega-PDF chunk salting
cheap (a chunk worker decodes only its page range, mirroring
split.py:28-42 semantics).

Supported surface (what the fixture corpus and common simple PDFs use):
classic xref tables, FlateDecode streams, flat /Pages trees, DeviceGray
8-bit image XObjects, and content streams with q/Q, cm, Do, BT/ET,
Tf/Td/TD/Tm, Tj/TJ. Unknown operators are skipped operand-safely.
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass, field
from typing import Any, Optional, Union

import numpy as np

from ..errors import UserError


class Name(str):
    """A PDF /Name token (distinct from strings)."""


@dataclass(frozen=True)
class Ref:
    num: int
    gen: int


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            ch = self.data[self.pos]
            if ch in _WS:
                self.pos += 1
            elif ch == 0x25:  # '%' comment
                while self.pos < n and d[self.pos] not in (0x0A, 0x0D):
                    self.pos += 1
            else:
                return

    def peek_bytes(self, n: int) -> bytes:
        self._skip_ws()
        return self.data[self.pos : self.pos + n]

    def next_token(self) -> Any:
        """Return the next lexical token: Name, bytes (string), float/int,
        one-char delimiters as str ('[', ']', '<<', '>>'), or a keyword str."""

        self._skip_ws()
        d = self.data
        if self.pos >= len(d):
            raise UserError("Unexpected end of PDF data.")
        ch = d[self.pos]

        if d.startswith(b"<<", self.pos):
            self.pos += 2
            return "<<"
        if d.startswith(b">>", self.pos):
            self.pos += 2
            return ">>"
        if ch == 0x5B:  # [
            self.pos += 1
            return "["
        if ch == 0x5D:  # ]
            self.pos += 1
            return "]"
        if ch == 0x2F:  # /Name
            self.pos += 1
            start = self.pos
            while self.pos < len(d) and d[self.pos] not in _WS and d[self.pos] not in _DELIM:
                self.pos += 1
            return Name(d[start : self.pos].decode("latin-1"))
        if ch == 0x28:  # ( string )
            return self._read_string()
        if ch == 0x3C:  # <hex string>
            end = d.index(b">", self.pos)
            hexed = re.sub(rb"\s", b"", d[self.pos + 1 : end])
            self.pos = end + 1
            if len(hexed) % 2:
                hexed += b"0"
            return bytes.fromhex(hexed.decode("ascii"))
        if ch in b"+-.0123456789":
            start = self.pos
            self.pos += 1
            while self.pos < len(d) and d[self.pos] in b".0123456789eE+-":
                self.pos += 1
            text = d[start : self.pos].decode("ascii")
            return float(text) if any(c in text for c in ".eE") else int(text)

        start = self.pos
        while self.pos < len(d) and d[self.pos] not in _WS and d[self.pos] not in _DELIM:
            self.pos += 1
        if self.pos == start:
            raise UserError(f"Bad PDF token at offset {self.pos}.")
        return d[start : self.pos].decode("latin-1")

    def _read_string(self) -> bytes:
        d = self.data
        assert d[self.pos] == 0x28
        self.pos += 1
        out = bytearray()
        depth = 1
        while self.pos < len(d):
            ch = d[self.pos]
            if ch == 0x5C:  # backslash escape
                nxt = d[self.pos + 1]
                mapping = {0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08, 0x66: 0x0C}
                out.append(mapping.get(nxt, nxt))
                self.pos += 2
                continue
            if ch == 0x28:
                depth += 1
            elif ch == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos += 1
                    return bytes(out)
            out.append(ch)
            self.pos += 1
        raise UserError("Unterminated PDF string.")


def _parse_value(lex: _Lexer, first: Any = None) -> Any:
    tok = lex.next_token() if first is None else first
    if tok == "<<":
        d: dict[str, Any] = {}
        while True:
            key = lex.next_token()
            if key == ">>":
                return d
            if not isinstance(key, Name):
                raise UserError(f"Expected /Name dict key, got {key!r}.")
            d[str(key)] = _parse_value(lex)
    if tok == "[":
        arr: list[Any] = []
        while True:
            save = lex.pos
            item = lex.next_token()
            if item == "]":
                return arr
            lex.pos = save
            arr.append(_parse_value(lex))
    if isinstance(tok, int):
        # Possible "N G R" indirect reference.
        save = lex.pos
        try:
            gen = lex.next_token()
            r = lex.next_token()
            if isinstance(gen, int) and r == "R":
                return Ref(tok, gen)
        except UserError:
            pass
        lex.pos = save
        return tok
    if tok == "true":
        return True
    if tok == "false":
        return False
    if tok == "null":
        return None
    return tok  # Name, bytes, float, or keyword


#: One-pass content-stream scanner (strings without nested parens,
#: names, numbers, array brackets, operators). Nested-paren strings and
#: inline dicts/hex route to the general lexer instead.
_CONTENT_RE = re.compile(
    rb"""(?P<str>\((?:[^()\\]|\\.)*\))
       | (?P<name>/[^\x00\t\n\x0c\r ()<>\[\]{}/%]*)
       | (?P<num>[+-]?(?:\d+\.?\d*|\.\d+))
       | (?P<lb>\[) | (?P<rb>\])
       | (?P<op>[A-Za-z'"*]{1,3})
    """,
    re.X,
)

_STR_ESCAPES = {0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08, 0x66: 0x0C}

#: A second unescaped '(' before the first string closes => nested
#: string; the fast scanner cannot handle those (conservative: may also
#: match across separate strings — that just takes the slow path).
_NESTED_PAREN_RE = re.compile(rb"\((?:[^()\\]|\\.)*\(")


def _unescape_pdf_string(raw: bytes) -> bytes:
    if b"\\" not in raw:
        return raw
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        ch = raw[i]
        if ch == 0x5C and i + 1 < n:
            nxt = raw[i + 1]
            out.append(_STR_ESCAPES.get(nxt, nxt))
            i += 2
        else:
            out.append(ch)
            i += 1
    return bytes(out)


def _scan_content_fast(stream: bytes):
    """Yield ("val", value) / ("op", name) via one regex pass."""

    array: Optional[list] = None
    for m in _CONTENT_RE.finditer(stream):
        kind = m.lastgroup
        if kind == "str":
            value: Any = _unescape_pdf_string(m.group()[1:-1])
        elif kind == "num":
            text = m.group().decode("ascii")
            value = float(text) if "." in text else int(text)
        elif kind == "name":
            value = Name(m.group()[1:].decode("latin-1"))
        elif kind == "lb":
            array = []
            continue
        elif kind == "rb":
            yield "val", array
            array = None
            continue
        else:  # operator
            yield "op", m.group().decode("latin-1")
            continue
        if array is not None:
            array.append(value)
        else:
            yield "val", value


def _scan_content_lexer(stream: bytes):
    """General-lexer fallback for exotic content streams."""

    lex = _Lexer(stream)
    while lex.pos < len(stream):
        try:
            save = lex.pos
            tok = lex.next_token()
        except UserError:
            return
        if isinstance(tok, (int, float, bytes, Name)) or tok in ("[", "<<"):
            lex.pos = save
            yield "val", _parse_value(lex)
        else:
            yield "op", tok


@dataclass
class ParsedPage:
    """One decoded page in stored (unrotated) orientation."""

    index: int
    width: int
    height: int
    rotate: int
    #: Full-page scan raster (h, w) uint8, or None when absent.
    scan: Optional[np.ndarray]
    #: Content items in stream order (the span-order source of truth):
    #: ("text", text, row, col) / ("image", gray_array, row, col)
    items: list[tuple] = field(default_factory=list)


class PdfDocument:
    """Lazy PDF reader over an in-memory byte string."""

    def __init__(self, data: bytes) -> None:
        if not data.startswith(b"%PDF"):
            raise UserError("Not a PDF: missing %PDF header.")
        self.data = data
        self._cache: dict[int, Any] = {}
        self._streams: dict[int, bytes] = {}
        self._offsets = self._read_xref()
        root = self._trailer.get("Root")
        catalog = self.resolve(root)
        if not isinstance(catalog, dict):
            raise UserError("PDF catalog not found.")
        pages_node = self.resolve(catalog.get("Pages"))
        self._kids: list[Ref] = self._flatten_kids(pages_node)

    # --- xref / object layer ---

    def _read_xref(self) -> dict[int, int]:
        """Walk the xref chain (latest table first, then /Prev links for
        incrementally-updated files); newer sections win."""

        tail = self.data[-256:]
        m = list(re.finditer(rb"startxref\s+(\d+)", tail))
        if not m:
            raise UserError("PDF has no startxref.")
        xref_at: Optional[int] = int(m[-1].group(1))
        offsets: dict[int, int] = {}
        main_trailer: Optional[dict] = None
        seen: set[int] = set()
        while xref_at is not None and xref_at not in seen:
            seen.add(xref_at)
            lex = _Lexer(self.data, xref_at)
            if lex.next_token() != "xref":
                raise UserError("Only classic xref tables are supported.")
            while True:
                save = lex.pos
                tok = lex.next_token()
                if tok == "trailer":
                    break
                start = tok
                count = lex.next_token()
                if not (isinstance(start, int) and isinstance(count, int)):
                    lex.pos = save
                    raise UserError("Malformed xref subsection header.")
                for i in range(count):
                    off = lex.next_token()
                    _gen = lex.next_token()
                    kind = lex.next_token()
                    if kind == "n":
                        offsets.setdefault(start + i, int(off))
            trailer = _parse_value(lex)
            if main_trailer is None:
                main_trailer = trailer
            prev = trailer.get("Prev")
            xref_at = int(prev) if isinstance(prev, (int, float)) else None
        self._trailer = main_trailer or {}
        return offsets

    def resolve(self, value: Any) -> Any:
        while isinstance(value, Ref):
            value = self._load_object(value.num)
        return value

    def _load_object(self, num: int) -> Any:
        if num in self._cache:
            return self._cache[num]
        off = self._offsets.get(num)
        if off is None:
            raise UserError(f"PDF object {num} not in xref.")
        lex = _Lexer(self.data, off)
        got_num = lex.next_token()
        got_gen = lex.next_token()
        kw = lex.next_token()
        if got_num != num or kw != "obj":
            raise UserError(f"Object {num} not found at xref offset {off}.")
        value = _parse_value(lex)
        if lex.peek_bytes(6) == b"stream":
            lex.pos += 6
            if self.data.startswith(b"\r\n", lex.pos):
                lex.pos += 2
            elif self.data.startswith(b"\n", lex.pos):
                lex.pos += 1
            length = self.resolve(value.get("Length"))
            raw = self.data[lex.pos : lex.pos + int(length)]
            if value.get("Filter") == Name("FlateDecode"):
                raw = zlib.decompress(raw)
            self._streams[num] = raw
        self._cache[num] = value
        return value

    def _flatten_kids(self, pages_node: Any) -> list[Ref]:
        kids: list[Ref] = []
        for kid in self.resolve(pages_node.get("Kids", [])):
            node = self.resolve(kid)
            if node.get("Type") == Name("Pages"):
                kids.extend(self._flatten_kids(node))
            else:
                kids.append(kid)
        return kids

    @property
    def page_count(self) -> int:
        return len(self._kids)

    # --- page / content layer ---

    def _stream_bytes(self, ref: Any) -> bytes:
        ref = ref if isinstance(ref, Ref) else None
        if ref is None:
            raise UserError("Expected an indirect stream reference.")
        self._load_object(ref.num)
        return self._streams[ref.num]

    def _content_stream(self, contents: Any) -> bytes:
        """Page /Contents: a single stream ref OR an array of stream
        refs (common in real producers) — concatenated with whitespace,
        per spec, as one logical stream."""

        if contents is None:
            return b""
        value = contents
        if isinstance(value, Ref):
            resolved = self.resolve(value)
            if isinstance(resolved, list):
                value = resolved  # indirect array of streams
            else:
                return self._stream_bytes(value)
        if isinstance(value, list):
            return b"\n".join(self._stream_bytes(r) for r in value)
        raise UserError("Unsupported /Contents value.")

    def _decode_image(self, ref: Ref) -> Optional[np.ndarray]:
        obj = self.resolve(ref)
        if obj.get("Subtype") != Name("Image"):
            return None
        w = int(self.resolve(obj["Width"]))
        h = int(self.resolve(obj["Height"]))
        if obj.get("ColorSpace") != Name("DeviceGray") or int(self.resolve(obj.get("BitsPerComponent", 8))) != 8:
            return None  # unsupported encodings surface as missing scans
        raw = self._stream_bytes(ref)
        if len(raw) < w * h:
            return None
        return np.frombuffer(raw[: w * h], dtype=np.uint8).reshape(h, w)

    def load_page(self, index: int) -> ParsedPage:
        """Decode one page: raster scan + ordered text/image items.

        Text/image positions are returned as raster pixel coords
        (row 0 = top) in the page's stored orientation; rotation
        normalization happens downstream against /Rotate.
        """

        if not (0 <= index < self.page_count):
            raise UserError(f"Page index {index} out of range (0..{self.page_count - 1}).")
        page = self.resolve(self._kids[index])
        media = [self.resolve(v) for v in self.resolve(page.get("MediaBox", [0, 0, 612, 792]))]
        width = int(media[2] - media[0])
        height = int(media[3] - media[1])
        rotate = int(self.resolve(page.get("Rotate", 0))) % 360

        resources = self.resolve(page.get("Resources", {})) or {}
        xobject_refs: dict[str, Ref] = {
            name: ref
            for name, ref in (self.resolve(resources.get("XObject", {})) or {}).items()
            if isinstance(ref, Ref)
        }

        stream = self._content_stream(page.get("Contents"))

        scan: Optional[np.ndarray] = None
        items: list[tuple] = []
        for kind, payload in self._tokenize_content(stream, height):
            if kind == "image":
                name, row, col, place_w, place_h = payload
                arr = self._decode_image(xobject_refs[name]) if name in xobject_refs else None
                if arr is None:
                    continue
                is_full_page_scan = (
                    scan is None
                    and arr.shape == (height, width)
                    and (place_w, place_h) == (width, height)
                )
                if is_full_page_scan:
                    scan = arr
                else:
                    items.append(("image", arr, row, col))
            else:
                text, row, col = payload
                items.append(("text", text, row, col))
        return ParsedPage(index, width, height, rotate, scan, items)

    @staticmethod
    def _tokenize_content(stream: bytes, page_height: int):
        """Yield ("text", (str, row, col)) / ("image", (name, row, col, w, h))
        in stream order. Implements the subset of the graphics/text state
        machine the corpus uses; unknown operators drop their operands.

        Content streams are token-dense, so the hot path is a single
        compiled-regex scan (C speed); streams containing inline dicts /
        hex strings fall back to the general lexer."""

        if b"<" not in stream and not _NESTED_PAREN_RE.search(stream):
            yield from PdfDocument._run_content_ops(
                _scan_content_fast(stream), page_height
            )
            return
        yield from PdfDocument._run_content_ops(
            _scan_content_lexer(stream), page_height
        )

    @staticmethod
    def _run_content_ops(tokens, page_height: int):
        operands: list[Any] = []
        ctm_stack: list[tuple] = []
        ctm = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)  # a b c d e f
        tx = ty = 0.0
        for kind, tok in tokens:
            if kind == "val":
                operands.append(tok)
                continue
            op = tok
            if op == "q":
                ctm_stack.append(ctm)
            elif op == "Q":
                ctm = ctm_stack.pop() if ctm_stack else (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
            elif op == "cm" and len(operands) >= 6:
                a, b_, c, d, e, f = (float(v) for v in operands[-6:])
                pa, pb, pc, pd, pe, pf = ctm
                ctm = (
                    a * pa + b_ * pc,
                    a * pb + b_ * pd,
                    c * pa + d * pc,
                    c * pb + d * pd,
                    e * pa + f * pc + pe,
                    e * pb + f * pd + pf,
                )
            elif op in ("Td", "TD") and len(operands) >= 2:
                # Td translates the text LINE matrix relative to the
                # current line start (PDF 32000-1 §9.4.2) — it is not an
                # absolute move. BT resets the origin; Tm sets absolute.
                tx += float(operands[-2])
                ty += float(operands[-1])
            elif op == "Tm" and len(operands) >= 6:
                tx, ty = float(operands[-2]), float(operands[-1])
            elif op == "Tj" and operands and isinstance(operands[-1], bytes):
                text = operands[-1].decode("latin-1")
                yield "text", (text, int(page_height - ty), int(tx))
            elif op == "TJ" and operands and isinstance(operands[-1], list):
                text = "".join(
                    part.decode("latin-1") for part in operands[-1] if isinstance(part, bytes)
                )
                yield "text", (text, int(page_height - ty), int(tx))
            elif op == "Do" and operands and isinstance(operands[-1], Name):
                name = str(operands[-1])
                a, _b, _c, d, e, f = ctm
                place_w, place_h = int(abs(a)), int(abs(d))
                col = int(e)
                row = int(page_height - (f + place_h))  # top edge
                yield "image", (name, row, col, place_w, place_h)
            elif op == "BT":
                tx = ty = 0.0
            # ET, Tf, and anything else: state-neutral here
            operands.clear()
