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
  the identity CID->codepoint map when no /ToUnicode is present.

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
# FontDecoder
# ---------------------------------------------------------------------------

class FontDecoder:
    """code-bytes -> str for one font.

    ``width`` is the code byte-width (1 for simple fonts, 2 for
    Identity-H/V composites). Per-code precedence: /ToUnicode CMap,
    then the encoding table (base + Differences), then identity."""

    __slots__ = ("width", "cmap", "table")

    def __init__(
        self,
        width: int,
        cmap: Optional[dict[int, str]] = None,
        table: Optional[list[str]] = None,
    ) -> None:
        self.width = width
        self.cmap = cmap
        self.table = table

    def decode(self, b: bytes) -> str:
        cmap, table = self.cmap, self.table
        if self.width == 2:
            n = len(b) - (len(b) % 2)
            codes = (int.from_bytes(b[i : i + 2], "big") for i in range(0, n, 2))
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
        # Identity-H / Identity-V: 2-byte codes. Non-identity predefined
        # CMaps would need the full CMap registry; /ToUnicode still
        # yields correct text for them when present (the common case).
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
