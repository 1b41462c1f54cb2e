"""Minimal, lazy PDF reader: xref walk + object parser + content-stream
tokenizer.

This is the engine-owned replacement for the reference's
``fitz.open(pdf_path)`` (render.py:89, split.py:96, rotate.py:97): it
exposes ``page_count`` cheaply (xref + pages tree only) and parses
individual pages on demand — which is what makes mega-PDF chunk salting
cheap (a chunk worker decodes only its page range, mirroring
split.py:28-42 semantics).

Supported surface:
- classic xref tables AND cross-reference streams (PDF 1.5+, §7.5.8),
  incl. /Prev incremental-update chains, /XRefStm hybrid files, and
  free-entry shadowing (an object freed by a newer revision stays gone)
- object streams (/Type /ObjStm, §7.5.7)
- stream filters: FlateDecode, LZWDecode, RunLengthDecode,
  ASCIIHexDecode, ASCII85Decode, with PNG/TIFF /DecodeParms predictors;
  filter arrays compose. DCTDecode image XObjects decode through the
  engine-owned JPEG codec (pdfio/jpeg.py, baseline AND progressive);
  CCITTFaxDecode (K < 0, Group 4) through the engine-owned T.6 codec
  (pdfio/ccitt.py); JPXDecode surfaces as missing rasters
- nested /Pages trees with attribute inheritance (Resources/MediaBox/
  CropBox/Rotate, §7.7.3.4)
- string escapes incl. \\ddd octal and line continuations
- DeviceGray 8-bit image XObjects; content streams with q/Q, cm, Do,
  BT/ET, Tf/Td/TD/Tm, Tj/TJ, and BI/ID/EI inline images (§8.9.7,
  abbreviated keys/filters, raw length from W*H*BPC so binary data
  containing 'EI' cannot truncate). Unknown operators are skipped
  operand-safely.
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


# --- stream filter pipeline (PDF 32000-1 §7.4) ---

def _ascii_hex_decode(data: bytes) -> bytes:
    body = data.split(b">", 1)[0]
    hexed = re.sub(rb"\s", b"", body)
    if len(hexed) % 2:
        hexed += b"0"
    return bytes.fromhex(hexed.decode("ascii"))


def _ascii85_decode(data: bytes) -> bytes:
    import base64

    body = re.sub(rb"\s", b"", data)
    if body.startswith(b"<~"):
        body = body[2:]
    if body.endswith(b"~>"):
        body = body[:-2]
    return base64.a85decode(body)


def _runlength_decode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        length = data[i]
        if length == 128:  # EOD
            break
        if length < 128:
            out += data[i + 1 : i + 2 + length]
            i += 2 + length
        else:
            out += data[i + 1 : i + 2] * (257 - length)
            i += 2
    return bytes(out)


def _lzw_decode(data: bytes, early_change: int = 1) -> bytes:
    """PDF LZWDecode: 9-12 bit variable-width codes, clear=256, EOD=257."""

    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: Optional[bytes] = None
    buf = bits = 0
    for byte in data:
        buf = (buf << 8) | byte
        bits += 8
        while bits >= width:
            bits -= width
            code = (buf >> bits) & ((1 << width) - 1)
            if code == 256:  # clear table
                table = table[:258]
                width = 9
                prev = None
                continue
            if code == 257:  # EOD
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise UserError("Corrupt LZW stream: first code out of range.")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise UserError("Corrupt LZW stream: code out of range.")
            out += entry
            prev = entry
            # Code width grows one entry early with EarlyChange=1
            # (the PDF default), at table sizes 511/1023/2047.
            if width < 12:
                bump_at = (511, 1023, 2047) if early_change else (512, 1024, 2048)
                if len(table) in bump_at:
                    width += 1
    return bytes(out)


def _unpredict(data: bytes, parms: dict) -> bytes:
    """Apply /DecodeParms prediction reversal (PNG predictors 10-15,
    TIFF predictor 2) after Flate/LZW decompression."""

    predictor = int(parms.get("Predictor", 1))
    if predictor <= 1:
        return data
    colors = int(parms.get("Colors", 1))
    bpc = int(parms.get("BitsPerComponent", 8))
    columns = int(parms.get("Columns", 1))
    bpp = max(1, (colors * bpc) // 8)
    row_len = (columns * colors * bpc + 7) // 8
    if predictor == 2:  # TIFF horizontal differencing (8-bit only here)
        if bpc != 8:
            raise UserError("TIFF predictor requires 8 bits per component.")
        arr = np.frombuffer(data, dtype=np.uint8).reshape(-1, row_len).copy()
        for x in range(bpp, row_len):
            arr[:, x] = (arr[:, x] + arr[:, x - bpp]) & 0xFF
        return arr.tobytes()
    # PNG predictors: every row is prefixed with a filter-type byte
    stride = row_len + 1
    if len(data) % stride:
        raise UserError("Predicted stream length is not a whole number of rows.")
    rows = np.frombuffer(data, dtype=np.uint8).reshape(-1, stride)
    out = np.zeros((rows.shape[0], row_len), dtype=np.uint8)
    for y in range(rows.shape[0]):
        ftype = rows[y, 0]
        line = rows[y, 1:].astype(np.int32)
        prior = out[y - 1].astype(np.int32) if y else np.zeros(row_len, dtype=np.int32)
        if ftype == 0:
            out[y] = line
        elif ftype == 2:  # Up
            out[y] = ((line + prior) & 0xFF).astype(np.uint8)
        elif ftype == 1 and row_len % bpp == 0:
            # Sub: out[x] = line[x] + out[x-bpp] (mod 256) — a modular
            # prefix sum per bpp lane; uint8 accumulate wraps mod 256,
            # so the whole row vectorizes (foreign PNGs hit this often;
            # the per-pixel loop was O(h*w) Python).
            lanes = rows[y, 1:].reshape(-1, bpp)
            out[y] = np.add.accumulate(lanes, axis=0, dtype=np.uint8).reshape(-1)
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            # The recurrence on out[x-bpp] forbids vectorizing along x,
            # but plain-int list arithmetic beats numpy scalar indexing
            # ~5x here (one C-call per element vs. per-op array
            # machinery) — this is the hot path for foreign
            # Paeth-filtered PNGs in the image-folder jobs.
            line_l = line.tolist()
            prior_l = prior.tolist()
            row = [0] * row_len
            for x in range(row_len):
                left = row[x - bpp] if x >= bpp else 0
                up = prior_l[x]
                if ftype == 1:
                    rec = line_l[x] + left
                elif ftype == 3:
                    rec = line_l[x] + (left + up) // 2
                else:
                    upleft = prior_l[x - bpp] if x >= bpp else 0
                    p = left + up - upleft
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - upleft)
                    if pa <= pb and pa <= pc:
                        rec = line_l[x] + left
                    elif pb <= pc:
                        rec = line_l[x] + up
                    else:
                        rec = line_l[x] + upleft
                row[x] = rec & 0xFF
            out[y] = np.asarray(row, dtype=np.uint8)
        else:
            raise UserError(f"Unknown PNG predictor filter type {ftype}.")
    return out.tobytes()


def _decode_stream_data(obj: dict, raw: bytes, resolve) -> bytes:
    """Run the stream's /Filter pipeline (with /DecodeParms) over raw
    bytes. Supported: FlateDecode, LZWDecode, RunLengthDecode,
    ASCIIHexDecode, ASCII85Decode — each optionally predicted.
    DCTDecode/JPXDecode/etc. raise (image consumers surface those as
    missing rasters)."""

    filters = resolve(obj.get("Filter"))
    if filters is None:
        return raw
    if not isinstance(filters, list):
        filters = [filters]
    parms = resolve(obj.get("DecodeParms", obj.get("DP")))
    if not isinstance(parms, list):
        parms = [parms] * len(filters)
    elif len(parms) < len(filters):
        # A short /DecodeParms array must not truncate the filter chain
        # (zip would silently skip the remaining decode stages).
        parms = parms + [None] * (len(filters) - len(parms))
    data = raw
    for name, parm in zip(filters, parms):
        parm = resolve(parm) or {}
        fname = str(name)
        if fname == "FlateDecode" or fname == "Fl":
            data = _unpredict(zlib.decompress(data), parm)
        elif fname == "LZWDecode" or fname == "LZW":
            data = _unpredict(_lzw_decode(data, int(parm.get("EarlyChange", 1))), parm)
        elif fname == "RunLengthDecode" or fname == "RL":
            data = _runlength_decode(data)
        elif fname == "ASCIIHexDecode" or fname == "AHx":
            data = _ascii_hex_decode(data)
        elif fname == "ASCII85Decode" or fname == "A85":
            data = _ascii85_decode(data)
        else:
            raise UserError(f"Unsupported stream filter: {fname}.")
    return data


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
            if ch == 0x5C:  # backslash escape (PDF 32000-1 §7.3.4.2)
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0x5C
                if 0x30 <= nxt <= 0x37:  # \ddd octal, 1-3 digits
                    val, k = 0, 0
                    while k < 3 and self.pos + 1 + k < len(d) and 0x30 <= d[self.pos + 1 + k] <= 0x37:
                        val = val * 8 + (d[self.pos + 1 + k] - 0x30)
                        k += 1
                    out.append(val & 0xFF)
                    self.pos += 1 + k
                elif nxt in (0x0A, 0x0D):  # backslash-EOL: line continuation
                    self.pos += 2
                    if nxt == 0x0D and self.pos < len(d) and d[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    out.append(_STR_ESCAPES.get(nxt, nxt))
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
            if 0x30 <= nxt <= 0x37:  # \ddd octal, 1-3 digits
                val, k = 0, 0
                while k < 3 and i + 1 + k < n and 0x30 <= raw[i + 1 + k] <= 0x37:
                    val = val * 8 + (raw[i + 1 + k] - 0x30)
                    k += 1
                out.append(val & 0xFF)
                i += 1 + k
            elif nxt in (0x0A, 0x0D):  # backslash-EOL: line continuation
                i += 2
                if nxt == 0x0D and i < n and raw[i] == 0x0A:
                    i += 1
            else:
                out.append(_STR_ESCAPES.get(nxt, nxt))
                i += 2
        else:
            out.append(ch)
            i += 1
    return bytes(out)


def _unpack_samples(raw: bytes, w: int, h: int, bpc: int):
    """Single-component samples at 1/2/4/16 bits per component ->
    (h, w) uint8 of RAW sample values (caller range-scales; 16-bit
    keeps the high byte). Rows are byte-padded per §8.9.5.2."""

    if bpc == 16:
        n = w * h * 2
        if len(raw) < n:
            return None
        return np.frombuffer(raw[:n], dtype=">u2").reshape(h, w).astype(np.uint16) \
            .__rshift__(8).astype(np.uint8)
    row_bytes = (w * bpc + 7) // 8
    if len(raw) < row_bytes * h:
        return None
    rows = np.frombuffer(raw[: row_bytes * h], dtype=np.uint8).reshape(h, row_bytes)
    bits = np.unpackbits(rows, axis=1)[:, : w * bpc]
    if bpc == 1:
        return bits
    samples = bits.reshape(h, w, bpc)
    weights = (1 << np.arange(bpc - 1, -1, -1)).astype(np.uint8)
    return (samples * weights).sum(axis=2).astype(np.uint8)


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
    """General-lexer fallback for exotic content streams (inline dicts,
    nested-paren strings, BI/ID/EI inline images)."""

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
        elif tok == "BI":
            try:
                arr = _read_inline_image(lex, stream)
            except UserError:
                return
            if arr is not None:
                yield "val", arr
                yield "op", "INLINE_IMG"
        else:
            yield "op", tok


#: Inline-image abbreviations (PDF 32000-1 Table 93).
_INLINE_KEYS = {"W": "Width", "H": "Height", "BPC": "BitsPerComponent",
                "CS": "ColorSpace", "F": "Filter", "DP": "DecodeParms",
                "D": "Decode", "IM": "ImageMask", "I": "Interpolate"}
_INLINE_CS = {"G": "DeviceGray", "RGB": "DeviceRGB", "CMYK": "DeviceCMYK"}
_INLINE_FILTERS = {"AHx": "ASCIIHexDecode", "A85": "ASCII85Decode",
                   "LZW": "LZWDecode", "Fl": "FlateDecode",
                   "RL": "RunLengthDecode", "CCF": "CCITTFaxDecode",
                   "DCT": "DCTDecode"}
_EI_RE = re.compile(rb"[\x00\t\n\x0c\r ]EI(?=[\x00\t\n\x0c\r /\[\]<>(]|$)")


def _read_inline_image(lex: "_Lexer", stream: bytes):
    """Parse one BI ... ID <data> EI block (§8.9.7) and return the
    decoded (h, w) / (h, w, 3) uint8 array, or None for unsupported
    variants (image masks, CMYK, non-8-bit). Leaves the lexer
    positioned after EI either way."""

    params: dict[str, Any] = {}
    while True:
        key = lex.next_token()
        if key == "ID":
            break
        if not isinstance(key, Name):
            raise UserError(f"Bad inline-image key {key!r}.")
        val = _parse_value(lex)
        params[_INLINE_KEYS.get(str(key), str(key))] = val
    pos = lex.pos
    if pos < len(stream) and stream[pos] in _WS:
        pos += 1  # exactly one whitespace after ID (§8.9.7)

    w = int(params.get("Width", 0))
    h = int(params.get("Height", 0))
    bpc = int(params.get("BitsPerComponent", 8))
    cs_raw = params.get("ColorSpace")
    cs = _INLINE_CS.get(str(cs_raw), str(cs_raw)) if cs_raw is not None else "DeviceGray"
    filters = params.get("Filter")
    flist = filters if isinstance(filters, list) else (
        [filters] if filters is not None else []
    )
    flist = [Name(_INLINE_FILTERS.get(str(f), str(f))) for f in flist]

    unsupported = (
        params.get("ImageMask") or bpc != 8 or cs not in ("DeviceGray", "DeviceRGB")
    )

    if not flist:
        # Unfiltered: the payload length is exactly computable, so the
        # EI after it is unambiguous even if the data contains 'EI'.
        ncomp = 3 if cs == "DeviceRGB" else (4 if cs == "DeviceCMYK" else 1)
        nbytes = h * ((w * ncomp * bpc + 7) // 8)
        data = stream[pos : pos + nbytes]
        pos += nbytes
        m = _EI_RE.search(stream, pos - 1)
        if m is None:
            raise UserError("Inline image missing EI.")
        lex.pos = m.end()
        if unsupported or len(data) < h * w * ncomp:
            return None
        arr = np.frombuffer(data[: h * w * ncomp], dtype=np.uint8)
        return arr.reshape(h, w, 3) if ncomp == 3 else arr.reshape(h, w)

    # Filtered: binary payloads (notably DCTDecode) may legally contain
    # whitespace+'EI', so the first match is only a CANDIDATE boundary.
    # Try successive matches until one decodes; a truncated candidate
    # fails its filter chain (zlib/huffman error, short raster) and the
    # next match is tried, so binary 'EI' bytes no longer desynchronize
    # the remaining token stream.
    candidates: list = []
    for m in _EI_RE.finditer(stream, pos):
        candidates.append(m)
        if len(candidates) >= 64:
            break
    if not candidates:
        raise UserError("Inline image missing EI.")
    if unsupported:
        lex.pos = candidates[0].end()
        return None

    obj = {"Filter": flist if len(flist) > 1 else flist[0]}
    if "DecodeParms" in params:
        obj["DecodeParms"] = params["DecodeParms"]
    ncomp = 3 if cs == "DeviceRGB" else 1

    def _try_decode(data: bytes):
        if str(flist[-1]) == "DCTDecode":
            from .jpeg import decode_jpeg

            sub = dict(obj)
            sub["Filter"] = flist[:-1] if len(flist) > 1 else None
            raw = _decode_stream_data(sub, data, lambda x: x) if sub["Filter"] else data
            arr = decode_jpeg(raw)
            return arr if arr.ndim in (2, 3) else None
        decoded = _decode_stream_data(obj, data, lambda x: x)
        if len(decoded) < h * w * ncomp:
            return None
        arr = np.frombuffer(decoded[: h * w * ncomp], dtype=np.uint8)
        return arr.reshape(h, w, 3) if ncomp == 3 else arr.reshape(h, w)

    for m in candidates:
        try:
            arr = _try_decode(stream[pos : m.start()])
        except Exception:  # truncated candidate: wrong boundary, try next
            continue
        if arr is not None:
            lex.pos = m.end()
            return arr
    lex.pos = candidates[0].end()
    return None


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

    #: Page attributes inherited down the /Pages tree (PDF 32000-1 §7.7.3.4).
    _INHERITABLE = ("Resources", "MediaBox", "CropBox", "Rotate")

    def __init__(self, data: bytes, password: str = "") -> None:
        if not data.startswith(b"%PDF"):
            raise UserError("Not a PDF: missing %PDF header.")
        self.data = data
        self._cache: dict[int, Any] = {}
        self._raw_streams: dict[int, bytes] = {}
        self._decoded_streams: dict[int, bytes] = {}
        self._objstm_cache: dict[int, tuple[list[tuple[int, int]], bytes, int]] = {}
        self._font_cache: dict[Any, Any] = {}
        self._gens: dict[int, int] = {}
        self._crypt = None
        self._encrypt_num: Optional[int] = None
        self._offsets = self._read_xref()
        self._setup_decryption(password)
        root = self._trailer.get("Root")
        catalog = self.resolve(root)
        if not isinstance(catalog, dict):
            raise UserError("PDF catalog not found.")
        pages_node = self.resolve(catalog.get("Pages"))
        #: (page ref, inherited attrs) in document order.
        self._kids: list[tuple[Ref, dict]] = self._flatten_kids(pages_node, {})

    # --- xref / object layer ---

    def _setup_decryption(self, password: str) -> None:
        """Standard security handler (§7.6.3) via pdfio/crypt.py: RC4
        V1/V2 R2/R3 and V4/R4 crypt filters (/CFM V2 or AESV2 — AES-128
        via pdfio/aes.py). The /Encrypt dictionary itself and xref
        streams are never encrypted; strings decrypt per owning object in
        :meth:`_load_object`, streams in :meth:`_decoded_stream_for`.
        Unsupported handlers (AES) raise UserError, which the job turns
        into a per-document error-lineage row."""

        enc = self._trailer.get("Encrypt")
        if enc is None:
            return
        from .crypt import build_decryptor

        if isinstance(enc, Ref):
            self._encrypt_num = enc.num
        enc_dict = self.resolve(enc)
        if not isinstance(enc_dict, dict):
            raise UserError("Malformed /Encrypt dictionary.")
        ids = self._trailer.get("ID")
        id0 = b""
        if isinstance(ids, list) and ids and isinstance(ids[0], bytes):
            id0 = ids[0]
        enc_direct = {k: self.resolve(v) for k, v in enc_dict.items()}
        cf = enc_direct.get("CF")
        if isinstance(cf, dict):
            enc_direct["CF"] = {
                k: self.resolve(v) if not isinstance(v, dict)
                else {kk: self.resolve(vv) for kk, vv in v.items()}
                for k, v in cf.items()
            }
        if str(enc_direct.get("Filter")) == "Adobe.PubSec":
            from .pubsec import build_pubsec_decryptor

            self._crypt = build_pubsec_decryptor(enc_direct)
            return
        self._crypt = build_decryptor(
            enc_direct, id0, password.encode("latin-1")
        )

    def _decrypt_value(self, value: Any, num: int, gen: int) -> Any:
        """Recursively decrypt string leaves of a parsed object (§7.6.2:
        strings encrypt with their OWNING object's key)."""

        if isinstance(value, bytes):
            return self._crypt.decrypt(value, num, gen)
        if isinstance(value, list):
            return [self._decrypt_value(v, num, gen) for v in value]
        if isinstance(value, dict):
            return {k: self._decrypt_value(v, num, gen) for k, v in value.items()}
        return value

    def _read_xref(self) -> dict[int, tuple]:
        """Walk the xref chain: classic tables AND cross-reference
        streams (PDF 1.5+, §7.5.8), following /Prev links (incremental
        updates) and /XRefStm (hybrid files). Newer sections win —
        including 'f' (free) entries, which shadow older in-use offsets
        so objects deleted by a later revision stay deleted.

        Entry values: ("n", byte_offset) for regular objects,
        ("c", objstm_num, idx) for objects in object streams, and
        ("f",) for freed objects.
        """

        tail = self.data[-256:]
        m = list(re.finditer(rb"startxref\s+(\d+)", tail))
        if not m:
            raise UserError("PDF has no startxref.")
        offsets: dict[int, tuple] = {}
        main_trailer: Optional[dict] = None
        seen: set[int] = set()
        queue: list[int] = [int(m[-1].group(1))]
        while queue:
            xref_at = queue.pop(0)
            if xref_at in seen:
                continue
            seen.add(xref_at)
            lex = _Lexer(self.data, xref_at)
            save = lex.pos
            tok = lex.next_token()
            if tok == "xref":  # classic table
                local: list[tuple[int, tuple]] = []
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
                            local.append((start + i, ("n", int(off))))
                        elif kind == "f":
                            local.append((start + i, ("f",)))
                trailer = _parse_value(lex)
                # Hybrid-reference files (§7.5.8.4): the table typically
                # marks object-stream-resident objects FREE so PDF-1.4
                # readers skip them, while /XRefStm carries their real
                # type-2 entries. The stream's entries must therefore be
                # applied BEFORE this table's own (setdefault = first
                # writer wins), not merely before /Prev.
                xs = trailer.get("XRefStm")
                if isinstance(xs, (int, float)) and int(xs) not in seen:
                    seen.add(int(xs))
                    self._read_xref_stream(_Lexer(self.data, int(xs)), offsets)
                for num, entry in local:
                    offsets.setdefault(num, entry)
            else:  # cross-reference stream: "N G obj << /Type /XRef ... >> stream"
                lex.pos = save
                trailer = self._read_xref_stream(lex, offsets)
            if main_trailer is None:
                main_trailer = trailer
            prev = trailer.get("Prev")
            if isinstance(prev, (int, float)):
                queue.append(int(prev))
        self._trailer = main_trailer or {}
        return offsets

    def _read_xref_stream(self, lex: _Lexer, offsets: dict[int, tuple]) -> dict:
        """Decode one /Type /XRef stream section into ``offsets`` and
        return its dict (which doubles as the trailer)."""

        got_num = lex.next_token()
        _gen = lex.next_token()
        kw = lex.next_token()
        if not isinstance(got_num, int) or kw != "obj":
            raise UserError("Malformed cross-reference section.")
        xd = _parse_value(lex)
        if not (isinstance(xd, dict) and xd.get("Type") == Name("XRef")):
            raise UserError("startxref does not point at an xref table or stream.")
        raw = self._read_raw_stream_here(lex, xd, allow_indirect_length=False)
        data = _decode_stream_data(xd, raw, lambda v: v)  # params are direct per spec
        w = [int(v) for v in xd.get("W", [])]
        if len(w) != 3:
            raise UserError("XRef stream missing /W widths.")
        size = int(xd.get("Size", 0))
        index = [int(v) for v in xd.get("Index", [0, size])]
        entry_len = sum(w)
        pos = 0
        for k in range(0, len(index), 2):
            start, count = index[k], index[k + 1]
            for i in range(count):
                chunk = data[pos : pos + entry_len]
                pos += entry_len
                fields = []
                at = 0
                for width in w:
                    fields.append(int.from_bytes(chunk[at : at + width], "big") if width else None)
                    at += width
                etype = fields[0] if w[0] else 1  # default type 1 when w1=0
                num = start + i
                if etype == 1:
                    offsets.setdefault(num, ("n", fields[1]))
                elif etype == 2:
                    offsets.setdefault(num, ("c", fields[1], fields[2]))
                else:  # type 0: free
                    offsets.setdefault(num, ("f",))
        return xd

    def _read_raw_stream_here(
        self, lex: _Lexer, value: dict, allow_indirect_length: bool = True
    ) -> bytes:
        """Position ``lex`` just after the dict: consume the stream
        keyword + EOL and return the raw (still encoded) bytes."""

        if lex.peek_bytes(6) != b"stream":
            raise UserError("Expected a stream.")
        lex.pos += 6
        if self.data.startswith(b"\r\n", lex.pos):
            lex.pos += 2
        elif self.data.startswith(b"\n", lex.pos):
            lex.pos += 1
        length = value.get("Length")
        if isinstance(length, Ref):
            if not allow_indirect_length:
                # During the xref walk no objects are resolvable yet;
                # fall back to scanning for the endstream keyword. Use
                # the LAST 'endstream' before the enclosing 'endobj' (a
                # payload containing the literal bytes would otherwise
                # truncate early) and strip at most ONE EOL — the spec
                # allows a single EOL before 'endstream' (§7.3.8.1);
                # any further trailing 0x0A/0x0D are data bytes.
                endobj = self.data.find(b"endobj", lex.pos)
                hi = endobj if endobj != -1 else len(self.data)
                end = self.data.rfind(b"endstream", lex.pos, hi)
                if end == -1:
                    end = self.data.index(b"endstream", lex.pos)
                chunk = self.data[lex.pos : end]
                if chunk.endswith(b"\r\n"):
                    chunk = chunk[:-2]
                elif chunk.endswith((b"\r", b"\n")):
                    chunk = chunk[:-1]
                return chunk
            length = self.resolve(length)
        return self.data[lex.pos : lex.pos + int(length)]

    def resolve(self, value: Any) -> Any:
        while isinstance(value, Ref):
            value = self._load_object(value.num)
        return value

    def _load_object(self, num: int) -> Any:
        if num in self._cache:
            return self._cache[num]
        entry = self._offsets.get(num)
        if entry is None or entry[0] == "f":
            raise UserError(f"PDF object {num} not in xref.")
        if entry[0] == "c":  # lives in an object stream (§7.5.7)
            value = self._load_from_objstm(entry[1], entry[2], num)
            self._cache[num] = value
            return value
        off = entry[1]
        lex = _Lexer(self.data, off)
        got_num = lex.next_token()
        got_gen = lex.next_token()
        kw = lex.next_token()
        if got_num != num or kw != "obj":
            raise UserError(f"Object {num} not found at xref offset {off}.")
        self._gens[num] = got_gen if isinstance(got_gen, int) else 0
        value = _parse_value(lex)
        if isinstance(value, dict) and lex.peek_bytes(6) == b"stream":
            # Store raw bytes; the filter pipeline runs lazily on first
            # consumption so one unsupported image filter doesn't poison
            # unrelated objects.
            self._raw_streams[num] = self._read_raw_stream_here(lex, value)
        if self._crypt is not None and num != self._encrypt_num:
            value = self._decrypt_value(value, num, self._gens[num])
        self._cache[num] = value
        return value

    def _load_from_objstm(self, objstm_num: int, idx: int, want_num: int) -> Any:
        cached = self._objstm_cache.get(objstm_num)
        if cached is None:
            stm_dict = self._load_object(objstm_num)
            if not (isinstance(stm_dict, dict) and stm_dict.get("Type") == Name("ObjStm")):
                raise UserError(f"Object {objstm_num} is not an object stream.")
            data = self._decoded_stream_for(objstm_num, stm_dict)
            n = int(self.resolve(stm_dict.get("N", 0)))
            first = int(self.resolve(stm_dict.get("First", 0)))
            hdr = _Lexer(data)
            pairs: list[tuple[int, int]] = []
            for _ in range(n):
                onum = hdr.next_token()
                ooff = hdr.next_token()
                if not (isinstance(onum, int) and isinstance(ooff, int)):
                    raise UserError("Malformed object-stream header.")
                pairs.append((onum, ooff))
            cached = (pairs, data, first)
            self._objstm_cache[objstm_num] = cached
        pairs, data, first = cached
        if idx >= len(pairs) or pairs[idx][0] != want_num:
            # be forgiving: locate by object number if the index is off
            matches = [o for o in pairs if o[0] == want_num]
            if not matches:
                raise UserError(f"Object {want_num} not present in object stream {objstm_num}.")
            onum, ooff = matches[0]
        else:
            onum, ooff = pairs[idx]
        return _parse_value(_Lexer(data, first + ooff))

    def _decoded_stream_for(self, num: int, obj: dict) -> bytes:
        data = self._decoded_streams.get(num)
        if data is None:
            raw = self._raw_streams[num]
            if self._crypt is not None and num != self._encrypt_num:
                # Stream content decrypts with the owning object's key
                # BEFORE the filter pipeline (§7.6.2). Xref streams
                # never route here (decoded directly in _read_xref).
                raw = self._crypt.decrypt(raw, num, self._gens.get(num, 0))
            data = _decode_stream_data(obj, raw, self.resolve)
            self._decoded_streams[num] = data
        return data

    def _flatten_kids(self, pages_node: Any, inherited: dict) -> list[tuple[Ref, dict]]:
        """Depth-first page refs with inherited attributes accumulated
        down nested /Pages trees (§7.7.3.4): a child node's own value
        overrides its ancestors'."""

        inh = dict(inherited)
        for key in self._INHERITABLE:
            if key in pages_node:
                inh[key] = pages_node[key]
        kids: list[tuple[Ref, dict]] = []
        for kid in self.resolve(pages_node.get("Kids", [])):
            node = self.resolve(kid)
            if node.get("Type") == Name("Pages"):
                kids.extend(self._flatten_kids(node, inh))
            else:
                kids.append((kid, inh))
        return kids

    @property
    def page_count(self) -> int:
        return len(self._kids)

    # --- page / content layer ---

    def _stream_bytes(self, ref: Any) -> bytes:
        ref = ref if isinstance(ref, Ref) else None
        if ref is None:
            raise UserError("Expected an indirect stream reference.")
        obj = self._load_object(ref.num)
        if ref.num not in self._raw_streams:
            raise UserError(f"Object {ref.num} has no stream.")
        return self._decoded_stream_for(ref.num, obj)

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

    def _last_filter_name(self, obj) -> Optional[str]:
        """Name of the innermost /Filter entry, or None."""

        filters = self.resolve(obj.get("Filter"))
        flist = filters if isinstance(filters, list) else (
            [filters] if filters is not None else []
        )
        return str(self.resolve(flist[-1])) if flist else None

    def _decode_image(self, ref: Ref) -> Optional[np.ndarray]:
        """Image XObject -> (h, w) gray or (h, w, 3) RGB uint8 array
        (the reference's PIL "L"/"RGB" modes, page_images.py:711-716);
        unsupported encodings surface as missing rasters."""

        obj = self.resolve(ref)
        if obj.get("Subtype") != Name("Image"):
            return None
        w = int(self.resolve(obj["Width"]))
        h = int(self.resolve(obj["Height"]))
        cs = self.resolve(obj.get("ColorSpace"))
        palette = None
        if isinstance(cs, list) and cs and self.resolve(cs[0]) == Name("Indexed"):
            # [/Indexed base hival lookup] (§8.6.6.3): decode indices,
            # then expand through the palette to the base space.
            if len(cs) != 4:
                return None
            base = self.resolve(cs[1])
            hival = int(self.resolve(cs[2]))
            lookup = self.resolve(cs[3])
            if isinstance(lookup, Ref):
                try:
                    lookup = self._stream_bytes(lookup)
                except UserError:
                    return None
            if not isinstance(lookup, bytes) or base not in (
                Name("DeviceRGB"), Name("DeviceGray")
            ):
                return None
            ncomp = 3 if base == Name("DeviceRGB") else 1
            if len(lookup) < (hival + 1) * ncomp:
                return None
            palette = np.frombuffer(
                lookup[: (hival + 1) * ncomp], dtype=np.uint8
            ).reshape(-1, ncomp)
            channels = 1  # one index sample per pixel on the wire
        elif cs == Name("DeviceGray"):
            channels = 1
        elif cs == Name("DeviceRGB"):
            channels = 3
        elif cs == Name("DeviceCMYK"):
            channels = 4
        elif cs is None and self._last_filter_name(obj) == "JPXDecode":
            # /ColorSpace is optional for JPXDecode (PDF 32000-1
            # 7.4.9: the codestream carries its own); the engine's
            # subset decodes gray only.
            channels = 1
        else:
            return None
        bpc = int(self.resolve(obj.get("BitsPerComponent", 8)))
        filters = self.resolve(obj.get("Filter"))
        flist = filters if isinstance(filters, list) else (
            [filters] if filters is not None else []
        )
        if flist and str(self.resolve(flist[-1])) in ("CCITTFaxDecode", "CCF"):
            # Group-4 fax scan (1-bit): the engine-owned T.6 codec
            # (pdfio/ccitt.py) decodes straight to 8-bit gray.
            if channels != 1:
                return None
            from .ccitt import decode_ccitt_pdf

            self._load_object(ref.num)
            raw = self._raw_streams.get(ref.num)
            if raw is None:
                return None
            if self._crypt is not None and ref.num != self._encrypt_num:
                raw = self._crypt.decrypt(raw, ref.num, self._gens.get(ref.num, 0))
            parms = self.resolve(obj.get("DecodeParms", obj.get("DP")))
            if isinstance(parms, list):
                if len(flist) > 1:
                    sub = dict(obj)
                    sub["Filter"] = flist[:-1]
                    sub["DecodeParms"] = parms[: len(flist) - 1]
                    try:
                        raw = _decode_stream_data(sub, raw, self.resolve)
                    except UserError:
                        return None
                parms = parms[-1]
            parms = self.resolve(parms) or {}
            parms = {k: self.resolve(v) for k, v in dict(parms).items()}
            # spec default is 1728 (PDF 32000-1 Table 11), NOT the image
            # /Width: a foreign PDF omitting Columns with Width != 1728
            # must fail the shape guard below, not decode against a
            # nonstandard row width.
            parms.setdefault("Columns", 1728)
            parms.setdefault("Rows", h)
            try:
                arr = decode_ccitt_pdf(raw, parms)
            except UserError:
                return None
            if arr.shape != (h, w):
                return None
            decode = self.resolve(obj.get("Decode"))
            if decode and list(decode)[:2] == [1, 0]:
                arr = (255 - arr).astype(np.uint8)
            return arr
        if flist and str(self.resolve(flist[-1])) == "JBIG2Decode":
            # JBIG2 bi-level scan: the engine-owned T.88 generic-region
            # codec (pdfio/jbig2.py) decodes straight to 8-bit gray.
            if channels != 1:
                return None
            from .jbig2 import decode_jbig2_pdf

            self._load_object(ref.num)
            raw = self._raw_streams.get(ref.num)
            if raw is None:
                return None
            if self._crypt is not None and ref.num != self._encrypt_num:
                raw = self._crypt.decrypt(raw, ref.num, self._gens.get(ref.num, 0))
            parms = self.resolve(obj.get("DecodeParms", obj.get("DP")))
            if isinstance(parms, list):
                if len(flist) > 1:
                    sub = dict(obj)
                    sub["Filter"] = flist[:-1]
                    sub["DecodeParms"] = parms[: len(flist) - 1]
                    try:
                        raw = _decode_stream_data(sub, raw, self.resolve)
                    except UserError:
                        return None
                parms = parms[-1]
            parms = self.resolve(parms) or {}
            parms = dict(parms)
            if parms.get("JBIG2Globals") is not None:
                # globals hold page-0 symbol dictionaries: the codec
                # needs the decoded stream BYTES, not the stream dict
                try:
                    parms["JBIG2Globals"] = self._stream_bytes(
                        parms["JBIG2Globals"]
                    )
                except UserError:
                    return None
            parms = {
                k: (v if k == "JBIG2Globals" else self.resolve(v))
                for k, v in parms.items()
            }
            try:
                arr = decode_jbig2_pdf(raw, parms)
            except UserError:
                return None
            if arr.shape != (h, w):
                return None
            decode = self.resolve(obj.get("Decode"))
            if decode and list(decode)[:2] == [1, 0]:
                arr = (255 - arr).astype(np.uint8)
            return arr
        if flist and str(self.resolve(flist[-1])) == "JPXDecode":
            # JPEG 2000 scan: the engine-owned T.800 codec
            # (pdfio/jpx.py) decodes the lossless-gray subset. Per PDF
            # 32000-1 7.4.9 the codestream's own parameters override
            # the image dict, so only the shape is cross-checked.
            from .jpx import decode_jpx_pdf

            self._load_object(ref.num)
            raw = self._raw_streams.get(ref.num)
            if raw is None:
                return None
            if self._crypt is not None and ref.num != self._encrypt_num:
                raw = self._crypt.decrypt(raw, ref.num, self._gens.get(ref.num, 0))
            if len(flist) > 1:
                sub = dict(obj)
                sub["Filter"] = flist[:-1]
                parms = self.resolve(obj.get("DecodeParms", obj.get("DP")))
                if isinstance(parms, list):
                    sub["DecodeParms"] = parms[: len(flist) - 1]
                try:
                    raw = _decode_stream_data(sub, raw, self.resolve)
                except UserError:
                    return None
            try:
                arr = decode_jpx_pdf(raw)
            except UserError:
                return None  # quantized/9-7/multi-tile — missing raster
            if arr.shape[:2] != (h, w):
                return None
            if channels == 1 and arr.ndim == 3:
                return None  # colorspace/stream mismatch
            if channels == 3 and arr.ndim == 2:
                arr = np.stack([arr] * 3, axis=-1)
            decode = self.resolve(obj.get("Decode"))
            if decode and list(decode)[:2] == [1, 0]:
                arr = (255 - arr).astype(np.uint8)
            return arr
        if bpc != 8 and not (bpc in (1, 2, 4, 16) and channels == 1 and not (
            flist and str(self.resolve(flist[-1])) in ("DCTDecode", "DCT")
        )):
            return None
        if flist and str(self.resolve(flist[-1])) in ("DCTDecode", "DCT"):
            # JPEG-compressed XObject: run any preceding filters
            # (e.g. [ASCII85, DCT]) on the raw bytes, then the engine's
            # own baseline JPEG decoder (pdfio/jpeg.py — the reference
            # inherits this from fitz.open, reference render.py:89).
            from .jpeg import decode_jpeg

            self._load_object(ref.num)
            raw = self._raw_streams.get(ref.num)
            if raw is None:
                return None
            if self._crypt is not None and ref.num != self._encrypt_num:
                raw = self._crypt.decrypt(raw, ref.num, self._gens.get(ref.num, 0))
            if len(flist) > 1:
                sub = dict(obj)
                sub["Filter"] = flist[:-1]
                parms = self.resolve(obj.get("DecodeParms", obj.get("DP")))
                if isinstance(parms, list):
                    sub["DecodeParms"] = parms[: len(flist) - 1]
                try:
                    raw = _decode_stream_data(sub, raw, self.resolve)
                except UserError:
                    return None
            try:
                arr = decode_jpeg(raw)
            except UserError:
                return None  # progressive/arithmetic — surface as missing
            if arr.shape[:2] != (h, w):
                return None
            if channels == 1 and arr.ndim == 3:
                return None  # colorspace/stream mismatch
            if channels == 3 and arr.ndim == 2:
                arr = np.stack([arr] * 3, axis=-1)
            return arr
        try:
            raw = self._stream_bytes(ref)
        except UserError:
            return None  # unsupported filter chain
        if bpc != 8:
            arr = _unpack_samples(raw, w, h, bpc)
            if arr is None:
                return None
            if palette is None:
                # scale sub-8/16-bit gray to the full 8-bit range
                if bpc == 16:
                    pass  # already high byte
                else:
                    arr = (arr.astype(np.uint16) * 255 // ((1 << bpc) - 1)).astype(np.uint8)
        else:
            n = w * h * channels
            if len(raw) < n:
                return None
            arr = np.frombuffer(raw[:n], dtype=np.uint8)
            arr = arr.reshape(h, w) if channels == 1 else arr.reshape(h, w, channels)
        if palette is not None:
            # palette expansion: index -> base-space sample(s)
            idx = np.minimum(arr, len(palette) - 1)
            arr = palette[idx]
            arr = arr[..., 0] if arr.shape[-1] == 1 else arr
            return np.ascontiguousarray(arr)
        if channels == 4:
            # naive CMYK -> RGB (additive inversion; no ICC in scope)
            c, m, y_, k = (arr[..., i].astype(np.float64) / 255.0 for i in range(4))
            rgb = np.stack(
                [(1 - c) * (1 - k), (1 - m) * (1 - k), (1 - y_) * (1 - k)], axis=-1
            )
            return np.clip(np.floor(rgb * 255.0 + 0.5), 0, 255).astype(np.uint8)
        decode = self.resolve(obj.get("Decode"))
        if decode and list(decode)[:2] == [1, 0]:
            arr = (255 - arr).astype(np.uint8)  # §8.9.5.2 inverted range
        return arr

    def load_page(self, index: int) -> ParsedPage:
        """Decode one page: raster scan + ordered text/image items.

        Text/image positions are returned as raster pixel coords
        (row 0 = top) in the page's stored orientation; rotation
        normalization happens downstream against /Rotate.
        """

        if not (0 <= index < self.page_count):
            raise UserError(f"Page index {index} out of range (0..{self.page_count - 1}).")
        ref, inherited = self._kids[index]
        page = self.resolve(ref)

        def attr(key: str, default: Any = None) -> Any:
            # Page's own value wins; else nearest ancestor (§7.7.3.4).
            if key in page:
                return page[key]
            return inherited.get(key, default)

        media = [self.resolve(v) for v in self.resolve(attr("MediaBox", [0, 0, 612, 792]))]
        width = int(media[2] - media[0])
        height = int(media[3] - media[1])
        rotate = int(self.resolve(attr("Rotate", 0))) % 360

        resources = self.resolve(attr("Resources", {})) or {}
        xobject_refs: dict[str, Ref] = {
            name: ref
            for name, ref in (self.resolve(resources.get("XObject", {})) or {}).items()
            if isinstance(ref, Ref)
        }
        font_refs: dict[str, Any] = dict(
            self.resolve(resources.get("Font", {})) or {}
        )

        stream = self._content_stream(page.get("Contents"))

        scan: Optional[np.ndarray] = None
        items: list[tuple] = []
        tokens = self._expand_forms(
            stream, dict(xobject_refs), xobject_refs, dict(font_refs), font_refs
        )

        def font_getter(name: str):
            return (
                self._font_decoder_for(font_refs[name])
                if name in font_refs else None
            )

        for kind, payload in self._run_content_ops(tokens, height, fonts=font_getter):
            if kind == "inline":
                arr, row, col, place_w, place_h = payload
                if (
                    scan is None
                    and arr.shape[:2] == (height, width)
                    and (place_w, place_h) == (width, height)
                ):
                    scan = arr
                else:
                    items.append(("image", arr, row, col))
            elif kind == "image":
                name, row, col, place_w, place_h = payload
                arr = self._decode_image(xobject_refs[name]) if name in xobject_refs else None
                if arr is None:
                    continue
                is_full_page_scan = (
                    scan is None
                    and arr.shape[:2] == (height, width)
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

    def _font_decoder_for(self, ref_or_dict: Any):
        """Per-document cached FontDecoder (or None: legacy text-string
        decoding) for a /Font resource entry."""

        from .fonts import build_font_decoder

        key = (
            (ref_or_dict.num, ref_or_dict.gen)
            if isinstance(ref_or_dict, Ref) else id(ref_or_dict)
        )
        if key in self._font_cache:
            return self._font_cache[key]
        dec = None
        try:
            obj = self.resolve(ref_or_dict)
            if isinstance(obj, dict):
                dec = build_font_decoder(obj, self.resolve, self._stream_bytes)
        except Exception:
            dec = None  # freed/malformed font: fall back to legacy decoding
        self._font_cache[key] = dec
        return dec

    @staticmethod
    def _text_bytes_to_str(b: bytes) -> str:
        """PDF text-string decoding (§7.9.2.2): UTF-16BE when the BOM
        is present, else PDFDocEncoding (latin-1 superset here)."""

        if b[:2] == b"\xfe\xff":
            try:
                return b[2:].decode("utf-16-be")
            except UnicodeDecodeError:
                return b[2:].decode("latin-1")
        return b.decode("latin-1")

    @staticmethod
    def _scan_tokens(stream: bytes):
        """Token scanner choice: content streams are token-dense, so
        the hot path is a single compiled-regex scan (C speed); streams
        containing inline dicts / hex strings / inline images fall back
        to the general lexer."""

        if (
            b"<" not in stream
            and b"BI" not in stream
            and not _NESTED_PAREN_RE.search(stream)
        ):
            return _scan_content_fast(stream)
        return _scan_content_lexer(stream)

    @staticmethod
    def _tokenize_content(stream: bytes, page_height: int):
        """Yield ("text", (str, row, col)) / ("image", (name, row, col, w, h))
        in stream order. Implements the subset of the graphics/text state
        machine the corpus uses; unknown operators drop their operands."""

        yield from PdfDocument._run_content_ops(
            PdfDocument._scan_tokens(stream), page_height
        )

    _FORM_DEPTH_MAX = 8

    def _expand_forms(
        self, stream: bytes, scope: dict, registry: dict,
        font_scope: "dict | None" = None, font_registry: "dict | None" = None,
        depth: int = 0,
    ):
        """Token stream with /Subtype /Form XObject invocations spliced
        inline (§8.10): `name Do` becomes `q [Matrix] cm <form tokens> Q`
        so the form's content executes under the caller's CTM. Image
        XObjects referenced INSIDE a form are re-registered under unique
        aliases in `registry` (load_page's name->Ref map) — form-local
        resource names cannot collide with the page's; form-local FONT
        resources get the same aliasing into `font_registry` so Tf
        inside a form binds the form's font, not a same-named page
        font. Depth-capped against recursive forms."""

        font_scope = font_scope if font_scope is not None else {}
        font_registry = font_registry if font_registry is not None else {}
        pending: list = []
        for kind, tok in PdfDocument._scan_tokens(stream):
            if kind == "val":
                pending.append((kind, tok))
                continue
            if (
                tok == "Tf"
                and depth > 0
                and len(pending) >= 2
                and isinstance(pending[-2][1], Name)
            ):
                name = str(pending[-2][1])
                fref = font_scope.get(name)
                if fref is not None:
                    alias = (
                        f"__form{depth}_font_{fref.num}_{fref.gen}"
                        if isinstance(fref, Ref)
                        else f"__form{depth}_font_{id(fref)}"
                    )
                    font_registry[alias] = fref
                    pending[-2] = ("val", Name(alias))
            if (
                tok == "Do"
                and pending
                and isinstance(pending[-1][1], Name)
                and depth < self._FORM_DEPTH_MAX
            ):
                name = str(pending[-1][1])
                ref = scope.get(name)
                obj = self.resolve(ref) if isinstance(ref, Ref) else None
                if isinstance(obj, dict) and obj.get("Subtype") == Name("Form"):
                    for item in pending[:-1]:
                        yield item
                    pending.clear()
                    try:
                        body = self._stream_bytes(ref)
                    except UserError:
                        continue  # unreadable form: skip invocation
                    res = self.resolve(obj.get("Resources")) or {}
                    sub_xo = self.resolve(res.get("XObject", {})) or {}
                    sub_scope = dict(scope)
                    sub_scope.update(
                        {n: r for n, r in sub_xo.items() if isinstance(r, Ref)}
                    )
                    sub_fonts = dict(font_scope)
                    sub_fonts.update(self.resolve(res.get("Font", {})) or {})
                    yield "op", "q"
                    matrix = self.resolve(obj.get("Matrix"))
                    if matrix and len(matrix) == 6:
                        for v in matrix:
                            yield "val", float(self.resolve(v))
                        yield "op", "cm"
                    yield from self._expand_forms(
                        body, sub_scope, registry, sub_fonts, font_registry,
                        depth + 1,
                    )
                    yield "op", "Q"
                    continue
                if depth > 0 and isinstance(ref, Ref):
                    # image Do inside a form: alias into the page registry
                    alias = f"__form{depth}_{ref.num}_{ref.gen}"
                    registry[alias] = ref
                    pending[-1] = ("val", Name(alias))
            for item in pending:
                yield item
            pending.clear()
            yield kind, tok
        yield from pending

    @staticmethod
    def _run_content_ops(tokens, page_height: int, fonts=None):
        operands: list[Any] = []
        ctm_stack: list[tuple] = []
        ctm = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)  # a b c d e f
        tx = ty = 0.0
        leading = 0.0
        cur_font = None  # FontDecoder of the Tf-selected font (or None)

        def dec(bs: bytes) -> str:
            # Tf-selected font decoding wins; fonts without an /Encoding
            # dict / /ToUnicode resolve to None and use the legacy
            # text-string path (fonts.py build_font_decoder).
            if cur_font is not None:
                return cur_font.decode(bs)
            return PdfDocument._text_bytes_to_str(bs)

        for kind, tok in tokens:
            if kind == "val":
                operands.append(tok)
                continue
            op = tok
            if op == "q":
                ctm_stack.append((ctm, cur_font))
            elif op == "Q":
                ctm, cur_font = (
                    ctm_stack.pop() if ctm_stack
                    else ((1.0, 0.0, 0.0, 1.0, 0.0, 0.0), None)
                )
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
                if op == "TD":  # TD also sets leading to -ty (§9.4.2)
                    leading = -float(operands[-1])
            elif op == "TL" and operands:
                leading = float(operands[-1])
            elif op == "T*":
                ty -= leading
            elif op == "'" and operands and isinstance(operands[-1], bytes):
                ty -= leading  # ' = T* then Tj (§9.4.3)
                yield "text", (dec(operands[-1]), int(page_height - ty), int(tx))
            elif op == '"' and len(operands) >= 3 and isinstance(operands[-1], bytes):
                ty -= leading  # " = aw ac set + T* + Tj; spacing ignored here
                yield "text", (dec(operands[-1]), int(page_height - ty), int(tx))
            elif op == "Tm" and len(operands) >= 6:
                tx, ty = float(operands[-2]), float(operands[-1])
            elif op == "Tj" and operands and isinstance(operands[-1], bytes):
                yield "text", (dec(operands[-1]), int(page_height - ty), int(tx))
            elif op == "TJ" and operands and isinstance(operands[-1], list):
                text = "".join(
                    dec(part) for part in operands[-1] if isinstance(part, bytes)
                )
                yield "text", (text, int(page_height - ty), int(tx))
            elif op == "Do" and operands and isinstance(operands[-1], Name):
                name = str(operands[-1])
                a, _b, _c, d, e, f = ctm
                place_w, place_h = int(abs(a)), int(abs(d))
                col = int(e)
                row = int(page_height - (f + place_h))  # top edge
                yield "image", (name, row, col, place_w, place_h)
            elif op == "INLINE_IMG" and operands and isinstance(operands[-1], np.ndarray):
                a, _b, _c, d, e, f = ctm
                place_w, place_h = int(abs(a)), int(abs(d))
                col = int(e)
                row = int(page_height - (f + place_h))
                yield "inline", (operands[-1], row, col, place_w, place_h)
            elif op == "Tf" and fonts is not None and len(operands) >= 2 and (
                isinstance(operands[-2], Name)
            ):
                cur_font = fonts(str(operands[-2]))
            elif op == "BT":
                tx = ty = 0.0
            # ET and anything else: state-neutral here
            operands.clear()
