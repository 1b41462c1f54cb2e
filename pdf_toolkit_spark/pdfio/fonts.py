"""Font-encoding layer: glyph codes -> Unicode text.

Covers the three mechanisms real-world PDFs use (PDF 32000-1 §9.6.6,
§9.7.6.2, §9.10; Adobe Glyph List specification):

- simple-font /Encoding: a base encoding name (WinAnsiEncoding,
  MacRomanEncoding, StandardEncoding) optionally overridden per-code by
  an /Encoding dict's /Differences array of glyph NAMES, resolved to
  Unicode through an AGL subset (explicit table + `uniXXXX`/`uXXXX`
  forms + accented-letter synthesis via unicodedata);
- /ToUnicode CMap streams (bfchar + bfrange, including array-form
  ranges), which override everything per code;
- composite Type0 fonts with /Identity-H or /Identity-V encodings:
  2-byte big-endian glyph codes mapped through /ToUnicode (the
  universal shape emitted for subsetted CID fonts), falling back to
  the identity CID->codepoint map when no /ToUnicode is present;
- composite Type0 fonts whose /Encoding is an EMBEDDED CMap stream:
  codespacerange-driven variable-width code segmentation (mixed 1-
  and 2-byte codespaces, matched byte-wise per PDF 32000-1 §9.7.6.2)
  plus the cidrange/cidchar code->CID table;
- the predefined Unicode CJK CMap names (UniJIS-UCS2-H/V, UniGB-,
  UniKS-, UniCNS-, and their -UTF16 forms): per the public Adobe CMap
  resources' structure their code space IS Unicode (UCS-2 / UTF-16BE),
  so without any /ToUnicode the show-string codes decode directly —
  chr(code) for UCS2, surrogate-pairing for UTF16 — which is exactly
  the text a full CMap-registry consumer recovers.

Reference parity: the reference delegates all of this to PyMuPDF
(reference render.py:89 `fitz.open`); here it is implemented from the
public spec so the engine extracts correct text from subsetted /
CID-font documents instead of mojibake.
"""

from __future__ import annotations

import re
import unicodedata
from typing import Any, Callable, Optional

# ---------------------------------------------------------------------------
# Adobe Glyph List subset
# ---------------------------------------------------------------------------

#: Explicit AGL entries for names that are not synthesizable from their
#: spelling (ASCII punctuation, ligatures, currency, quotes, dashes, …).
_AGL: dict[str, str] = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    # Latin-1 supplement & friends
    "exclamdown": "¡", "cent": "¢", "sterling": "£",
    "currency": "¤", "yen": "¥", "brokenbar": "¦",
    "section": "§", "dieresis": "¨", "copyright": "©",
    "ordfeminine": "ª", "guillemotleft": "«",
    "logicalnot": "¬", "registered": "®", "macron": "¯",
    "degree": "°", "plusminus": "±", "acute": "´",
    "mu": "µ", "paragraph": "¶", "periodcentered": "·",
    "cedilla": "¸", "ordmasculine": "º",
    "guillemotright": "»", "onequarter": "¼",
    "onehalf": "½", "threequarters": "¾",
    "questiondown": "¿", "multiply": "×", "divide": "÷",
    "ae": "æ", "AE": "Æ", "oe": "œ", "OE": "Œ",
    "oslash": "ø", "Oslash": "Ø", "germandbls": "ß",
    "thorn": "þ", "Thorn": "Þ", "eth": "ð",
    "Eth": "Ð", "dotlessi": "ı", "lslash": "ł",
    "Lslash": "Ł", "florin": "ƒ",
    # typographic set (WinAnsi 0x80-0x9F territory)
    "Euro": "€", "euro": "€", "quotesinglbase": "‚",
    "quotedblbase": "„", "ellipsis": "…", "dagger": "†",
    "daggerdbl": "‡", "circumflex": "ˆ",
    "perthousand": "‰", "guilsinglleft": "‹",
    "guilsinglright": "›", "quoteleft": "‘",
    "quoteright": "’", "quotedblleft": "“",
    "quotedblright": "”", "bullet": "•", "endash": "–",
    "emdash": "—", "tilde": "˜", "trademark": "™",
    "minus": "−", "fraction": "⁄", "fi": "ﬁ",
    "fl": "ﬂ", "breve": "˘", "dotaccent": "˙",
    "ring": "˚", "ogonek": "˛", "hungarumlaut": "˝",
    "caron": "ˇ",
}

#: accent-suffix -> Unicode "WITH ..." spelling for synthesized lookups
_ACCENTS = {
    "acute": "ACUTE", "grave": "GRAVE", "circumflex": "CIRCUMFLEX",
    "dieresis": "DIAERESIS", "tilde": "TILDE", "ring": "RING ABOVE",
    "cedilla": "CEDILLA", "macron": "MACRON", "breve": "BREVE",
    "caron": "CARON", "ogonek": "OGONEK", "slash": "STROKE",
    "hungarumlaut": "DOUBLE ACUTE", "dotaccent": "DOT ABOVE",
}

_UNI_RE = re.compile(r"^uni([0-9A-Fa-f]{4})+$")
_U_RE = re.compile(r"^u([0-9A-Fa-f]{4,6})$")


def glyph_to_unicode(name: str) -> Optional[str]:
    """AGL resolution for one glyph name; None when unmapped."""

    if "." in name:  # variant suffix (a.sc, one.oldstyle): map the base
        name = name.split(".", 1)[0]
    if not name:
        return None
    if len(name) == 1 and (name.isalpha() or name.isdigit()):
        return name
    if name in _AGL:
        return _AGL[name]
    m = _UNI_RE.match(name)
    if m:
        hexes = name[3:]
        units = [int(hexes[i : i + 4], 16) for i in range(0, len(hexes), 4)]
        try:
            return b"".join(u.to_bytes(2, "big") for u in units).decode(
                "utf-16-be"
            )
        except UnicodeDecodeError:
            return None
    m = _U_RE.match(name)
    if m:
        cp = int(m.group(1), 16)
        return chr(cp) if cp <= 0x10FFFF else None
    # synthesized accented Latin letters: e.g. 'eacute', 'Adieresis'
    if len(name) >= 3 and name[0].isalpha() and name[1:] in _ACCENTS:
        case = "CAPITAL" if name[0].isupper() else "SMALL"
        try:
            return unicodedata.lookup(
                f"LATIN {case} LETTER {name[0].upper()} WITH {_ACCENTS[name[1:]]}"
            )
        except KeyError:
            return None
    return None


# ---------------------------------------------------------------------------
# Simple-font base encoding tables
# ---------------------------------------------------------------------------

def _base_table(encoding_name: str) -> list[str]:
    """256-entry code -> char table for a base encoding name.

    WinAnsi == cp1252 and MacRoman == mac_roman exactly (both public);
    StandardEncoding and unknown names fall back to latin-1, matching
    the engine's historic PDFDocEncoding behavior for the bytes where
    they differ (documented approximation; /Differences and /ToUnicode
    override per code regardless)."""

    codec = {
        "WinAnsiEncoding": "cp1252",
        "MacRomanEncoding": "mac_roman",
    }.get(encoding_name, "latin-1")
    table: list[str] = []
    for i in range(256):
        try:
            table.append(bytes([i]).decode(codec))
        except UnicodeDecodeError:
            table.append(chr(i))  # undefined slot: latin-1 identity
    return table


# ---------------------------------------------------------------------------
# /ToUnicode CMap parsing
# ---------------------------------------------------------------------------

_HEX_TOK = re.compile(rb"<([0-9A-Fa-f\s]*)>|\[|\]")
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)


def _hex_bytes(h: bytes) -> bytes:
    h = re.sub(rb"\s+", b"", h)
    if len(h) % 2:
        h += b"0"  # odd nibble count pads with 0 (§7.3.4.3)
    return bytes.fromhex(h.decode("ascii"))


def _dst_str(raw: bytes) -> str:
    if len(raw) % 2:
        raw += b"\x00"
    try:
        return raw.decode("utf-16-be")
    except UnicodeDecodeError:
        return "�"


def parse_tounicode(data: bytes) -> dict[int, str]:
    """bfchar + bfrange sections of a ToUnicode CMap -> {code: text}.

    Codes are the big-endian integer value of the source hex string
    (1- or 2-byte; the consumer segments show-string bytes by font
    width). Range destinations increment the destination value; array
    destinations map positionally."""

    out: dict[int, str] = {}
    for m in _BFCHAR_RE.finditer(data):
        toks = [t for t in _HEX_TOK.finditer(m.group(1)) if t.group(1) is not None]
        for i in range(0, len(toks) - 1, 2):
            src = _hex_bytes(toks[i].group(1))
            dst = _hex_bytes(toks[i + 1].group(1))
            out[int.from_bytes(src, "big")] = _dst_str(dst)
    for m in _BFRANGE_RE.finditer(data):
        toks = list(_HEX_TOK.finditer(m.group(1)))
        i = 0
        while i < len(toks):
            if toks[i].group(1) is None:
                i += 1  # stray bracket outside the array form
                continue
            if i + 2 >= len(toks):
                break
            lo = int.from_bytes(_hex_bytes(toks[i].group(1)), "big")
            hi = int.from_bytes(_hex_bytes(toks[i + 1].group(1)), "big")
            third = toks[i + 2]
            if third.group(0) == b"[":
                # [ <dst> <dst> ... ] positional form
                j = i + 3
                code = lo
                while j < len(toks) and toks[j].group(0) != b"]":
                    if toks[j].group(1) is not None and code <= hi:
                        out[code] = _dst_str(_hex_bytes(toks[j].group(1)))
                        code += 1
                    j += 1
                i = j + 1
            else:
                dst_raw = _hex_bytes(third.group(1))
                width = max(len(dst_raw), 2)
                base = int.from_bytes(dst_raw, "big")
                for off in range(hi - lo + 1):
                    out[lo + off] = _dst_str(
                        (base + off).to_bytes(width, "big")
                    )
                i += 3
    return out


# ---------------------------------------------------------------------------
# Embedded CMap streams (/Encoding as a stream: PDF 32000-1 §9.7.5.3)
# ---------------------------------------------------------------------------

_CSR_RE = re.compile(rb"begincodespacerange(.*?)endcodespacerange", re.S)
_CIDR_RE = re.compile(rb"begincidrange(.*?)endcidrange", re.S)
_CIDC_RE = re.compile(rb"begincidchar(.*?)endcidchar", re.S)
_HEX_OR_INT = re.compile(rb"<([0-9A-Fa-f\s]*)>|(\d+)")

#: predefined Unicode CJK CMap names: the code space is UCS-2 / UTF-16
_PREDEF_UCS2_RE = re.compile(r"^Uni(JIS|JIS2004|JISX0213|GB|KS|CNS)-UCS2-(HW-)?[HV]$")
_PREDEF_UTF16_RE = re.compile(r"^Uni(JIS|JIS2004|JISX0213|GB|KS|CNS)-UTF16-[HV]$")


def parse_cmap_stream(
    data: bytes,
) -> "tuple[list[tuple[bytes, bytes]], dict[int, int]]":
    """Embedded CMap program -> (codespace ranges, code->CID map).

    Codespace ranges are (lo_bytes, hi_bytes) pairs of equal length;
    a show-string code matches a range when every byte sits inside the
    corresponding [lo, hi] byte interval (§9.7.6.2's byte-wise rule,
    NOT an integer compare). cidrange destinations are decimal CIDs
    that increment across the range; cidchar maps single codes."""

    spaces: list[tuple[bytes, bytes]] = []
    for m in _CSR_RE.finditer(data):
        toks = [
            _hex_bytes(t.group(1))
            for t in _HEX_OR_INT.finditer(m.group(1))
            if t.group(1) is not None
        ]
        for i in range(0, len(toks) - 1, 2):
            lo, hi = toks[i], toks[i + 1]
            if lo and len(lo) == len(hi):
                spaces.append((lo, hi))
    cid_map: dict[int, int] = {}
    for m in _CIDR_RE.finditer(data):
        toks = list(_HEX_OR_INT.finditer(m.group(1)))
        for i in range(0, len(toks) - 2, 3):
            if (toks[i].group(1) is None or toks[i + 1].group(1) is None
                    or toks[i + 2].group(2) is None):
                continue
            lo = int.from_bytes(_hex_bytes(toks[i].group(1)), "big")
            hi = int.from_bytes(_hex_bytes(toks[i + 1].group(1)), "big")
            dst = int(toks[i + 2].group(2))
            if hi - lo > 1 << 20:
                continue  # implausible range: skip, never OOM
            for off in range(hi - lo + 1):
                cid_map[lo + off] = dst + off
    for m in _CIDC_RE.finditer(data):
        toks = list(_HEX_OR_INT.finditer(m.group(1)))
        for i in range(0, len(toks) - 1, 2):
            if toks[i].group(1) is None or toks[i + 1].group(2) is None:
                continue
            code = int.from_bytes(_hex_bytes(toks[i].group(1)), "big")
            cid_map[code] = int(toks[i + 1].group(2))
    return spaces, cid_map


# ---------------------------------------------------------------------------
# FontDecoder
# ---------------------------------------------------------------------------

class FontDecoder:
    """code-bytes -> str for one font.

    ``width`` is the code byte-width (1 for simple fonts, 2 for
    Identity-H/V and predefined-Unicode composites); ``codespaces``
    (embedded CMaps) switches to byte-wise variable-width
    segmentation instead; ``utf16`` pairs surrogates (the
    UniXXX-UTF16 predefined CMaps). Per-code precedence: /ToUnicode
    CMap, then the encoding table (base + Differences), then
    identity."""

    __slots__ = ("width", "cmap", "table", "codespaces", "cid_map", "utf16")

    def __init__(
        self,
        width: int,
        cmap: Optional[dict[int, str]] = None,
        table: Optional[list[str]] = None,
        codespaces: "Optional[list[tuple[bytes, bytes]]]" = None,
        cid_map: Optional[dict[int, int]] = None,
        utf16: bool = False,
    ) -> None:
        self.width = width
        self.cmap = cmap
        self.table = table
        self.codespaces = codespaces
        self.cid_map = cid_map
        self.utf16 = utf16

    def cid_of(self, code: int) -> int:
        """code -> CID through the embedded CMap (identity without
        one) — the glyph-selection layer; text never depends on it."""

        if self.cid_map is not None and code in self.cid_map:
            return self.cid_map[code]
        return code

    def _codes(self, b: bytes) -> "list[int]":
        spaces = self.codespaces
        if not spaces:
            n = len(b) - (len(b) % 2)
            return [
                int.from_bytes(b[i : i + 2], "big") for i in range(0, n, 2)
            ]
        codes: list[int] = []
        i = 0
        L = len(b)
        while i < L:
            nbytes = 1
            for lo, hi in spaces:
                k = len(lo)
                if i + k <= L and all(
                    lo[j] <= b[i + j] <= hi[j] for j in range(k)
                ):
                    nbytes = k
                    break
            codes.append(int.from_bytes(b[i : i + nbytes], "big"))
            i += nbytes
        return codes

    def decode(self, b: bytes) -> str:
        cmap, table = self.cmap, self.table
        if self.width == 2:
            if self.utf16 and cmap is None:
                n = len(b) - (len(b) % 2)
                return b[:n].decode("utf-16-be", errors="replace")
            codes = self._codes(b)
            if cmap is None:
                return "".join(chr(c) for c in codes)
            return "".join(cmap.get(c) or chr(c) for c in codes)
        parts: list[str] = []
        for c in b:
            if cmap is not None and c in cmap:
                parts.append(cmap[c])
            elif table is not None:
                parts.append(table[c])
            else:
                parts.append(chr(c))
        return "".join(parts)


def build_font_decoder(
    font: dict,
    resolve: Callable[[Any], Any],
    stream_bytes: Callable[[Any], bytes],
) -> Optional[FontDecoder]:
    """FontDecoder for a /Font dict, or None when the font adds nothing
    over the engine's default text-string decoding (simple font, no
    /Encoding dict or name, no /ToUnicode) — keeping the legacy path
    byte-for-byte for the fixture corpus."""

    subtype = str(resolve(font.get("Subtype")) or "")
    cmap: Optional[dict[int, str]] = None
    tu = font.get("ToUnicode")
    if tu is not None:
        try:
            cmap = parse_tounicode(stream_bytes(tu))
        except Exception:
            cmap = None

    if subtype == "Type0":
        enc_raw = font.get("Encoding")
        enc = resolve(enc_raw)
        if isinstance(enc, dict):
            # embedded CMap stream: codespace-driven segmentation +
            # code->CID ranges; /ToUnicode still supplies the text
            try:
                spaces, cid_map = parse_cmap_stream(stream_bytes(enc_raw))
            except Exception:
                spaces, cid_map = [], {}
            return FontDecoder(
                2, cmap=cmap, codespaces=spaces or None,
                cid_map=cid_map or None,
            )
        name = str(enc) if enc is not None else ""
        if _PREDEF_UTF16_RE.match(name):
            return FontDecoder(2, cmap=cmap, utf16=True)
        # Identity-H / Identity-V and the UniXXX-UCS2 names: 2-byte
        # codes; for UCS2 the code IS the BMP code point, so the
        # chr(code) fallback is the registry-correct text. Other
        # predefined names without /ToUnicode keep the disclosed
        # identity fallback.
        return FontDecoder(2, cmap=cmap)

    enc = resolve(font.get("Encoding"))
    table: Optional[list[str]] = None
    if enc is not None:
        if isinstance(enc, dict):
            base = resolve(enc.get("BaseEncoding"))
            table = _base_table(str(base) if base is not None else "StandardEncoding")
            diffs = resolve(enc.get("Differences"))
            if isinstance(diffs, list):
                code = 0
                for item in diffs:
                    item = resolve(item)
                    if isinstance(item, (int, float)):
                        code = int(item)
                    else:
                        u = glyph_to_unicode(str(item))
                        if 0 <= code < 256:
                            table[code] = u if u is not None else "�"
                        code += 1
        else:
            table = _base_table(str(enc))
    if cmap is None and table is None:
        return None
    return FontDecoder(1, cmap=cmap, table=table)
