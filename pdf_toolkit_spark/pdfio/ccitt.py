"""CCITT Group 4 (ITU-T T.6, pure 2D/MMR) and Group 3 (ITU-T T.4,
1D modified-Huffman and mixed 1D/2D) fax codecs.

Group 4 (/CCITTFaxDecode with /K < 0) is the dominant encoding of
black-and-white scanned pages in PDFs; Group 3 (/K >= 0) is the
fax-era shape still common in older scan archives. Built from the
public T.4/T.6 code tables; the decoders are cross-validated in tests
against the JDK's TIFF writer producing "CCITT T.6"/"CCITT T.4"
strips, and the encoders round-trip through the JDK's reader — two
independent implementations agreeing on both directions.

Bit convention: run lengths code alternating WHITE-first runs; a
decoded row is returned as uint8 0/1 per pixel with 1 = black.
PDF-facing helpers map that to 8-bit gray honoring /BlackIs1.
"""

from __future__ import annotations

import numpy as np

from ..errors import UserError

#: T.4 terminating codes, run 0-63 (white, black).
_WHITE_TERM = [
    "00110101", "000111", "0111", "1000", "1011", "1100", "1110", "1111",
    "10011", "10100", "00111", "01000", "001000", "000011", "110100", "110101",
    "101010", "101011", "0100111", "0001100", "0001000", "0010111", "0000011",
    "0000100", "0101000", "0101011", "0010011", "0100100", "0011000",
    "00000010", "00000011", "00011010", "00011011", "00010010", "00010011",
    "00010100", "00010101", "00010110", "00010111", "00101000", "00101001",
    "00101010", "00101011", "00101100", "00101101", "00000100", "00000101",
    "00001010", "00001011", "01010010", "01010011", "01010100", "01010101",
    "00100100", "00100101", "01011000", "01011001", "01011010", "01011011",
    "01001010", "01001011", "00110010", "00110011", "00110100",
]
_BLACK_TERM = [
    "0000110111", "010", "11", "10", "011", "0011", "0010", "00011",
    "000101", "000100", "0000100", "0000101", "0000111", "00000100",
    "00000111", "000011000", "0000010111", "0000011000", "0000001000",
    "00001100111", "00001101000", "00001101100", "00000110111",
    "00000101000", "00000010111", "00000011000", "000011001010",
    "000011001011", "000011001100", "000011001101", "000001101000",
    "000001101001", "000001101010", "000001101011", "000011010010",
    "000011010011", "000011010100", "000011010101", "000011010110",
    "000011010111", "000001101100", "000001101101", "000011011010",
    "000011011011", "000001010100", "000001010101", "000001010110",
    "000001010111", "000001100100", "000001100101", "000001010010",
    "000001010011", "000000100100", "000000110111", "000000111000",
    "000000100111", "000000101000", "000001011000", "000001011001",
    "000000101011", "000000101100", "000001011010", "000001100110",
    "000001100111",
]
#: Makeup codes, runs 64, 128, ..., 1728.
_WHITE_MAKEUP = [
    "11011", "10010", "010111", "0110111", "00110110", "00110111",
    "01100100", "01100101", "01101000", "01100111", "011001100",
    "011001101", "011010010", "011010011", "011010100", "011010101",
    "011010110", "011010111", "011011000", "011011001", "011011010",
    "011011011", "010011000", "010011001", "010011010", "011000",
    "010011011",
]
_BLACK_MAKEUP = [
    "0000001111", "000011001000", "000011001001", "000001011011",
    "000000110011", "000000110100", "000000110101", "0000001101100",
    "0000001101101", "0000001001010", "0000001001011", "0000001001100",
    "0000001001101", "0000001110010", "0000001110011", "0000001110100",
    "0000001110101", "0000001110110", "0000001110111", "0000001010010",
    "0000001010011", "0000001010100", "0000001010101", "0000001011010",
    "0000001011011", "0000001100100", "0000001100101",
]
#: Extended makeup codes (shared), runs 1792, 1856, ..., 2560.
_EXT_MAKEUP = [
    "00000001000", "00000001100", "00000001101", "000000010010",
    "000000010011", "000000010100", "000000010101", "000000010110",
    "000000010111", "000000011100", "000000011101", "000000011110",
    "000000011111",
]

_MODE_P, _MODE_H = "P", "H"
#: 2D mode codes (T.4 §4.2.1.3.7 table): vertical offsets -3..3, pass,
#: horizontal.
_MODE_CODES = {
    "1": 0, "011": 1, "000011": 2, "0000011": 3,
    "010": -1, "000010": -2, "0000010": -3,
    "0001": _MODE_P, "001": _MODE_H,
}


def _run_decode_table(term, makeup):
    t = {}
    for run, code in enumerate(term):
        t[(len(code), int(code, 2))] = run
    for i, code in enumerate(makeup):
        t[(len(code), int(code, 2))] = 64 * (i + 1)
    for i, code in enumerate(_EXT_MAKEUP):
        t[(len(code), int(code, 2))] = 1792 + 64 * i
    return t


_WHITE_DEC = _run_decode_table(_WHITE_TERM, _WHITE_MAKEUP)
_BLACK_DEC = _run_decode_table(_BLACK_TERM, _BLACK_MAKEUP)
_MODE_DEC = {(len(c), int(c, 2)): m for c, m in _MODE_CODES.items()}
_MAX_CODE_LEN = 14


class _Bits:
    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position
        self.n = len(data) * 8

    def read_code(self, table: dict) -> int | str:
        code = 0
        for length in range(1, _MAX_CODE_LEN + 1):
            if self.pos >= self.n:
                raise UserError("CCITT stream exhausted mid-code.")
            byte = self.data[self.pos >> 3]
            bit = (byte >> (7 - (self.pos & 7))) & 1
            self.pos += 1
            code = (code << 1) | bit
            hit = table.get((length, code))
            if hit is not None:
                return hit
        raise UserError("Invalid CCITT code word.")


def _decode_2d_row(bits: "_Bits", columns: int, ref: list[int]) -> np.ndarray:
    """One 2D-coded row (T.6 / T.4 2D share the mode codes) against the
    reference line's transition list."""

    row = np.zeros(columns, dtype=np.uint8)
    a0 = -1
    color = 0  # 0 = white, 1 = black
    while a0 < columns:
        # b1: first ref transition > a0 with opposite color of a0
        b1 = columns
        for i, t in enumerate(ref):
            if t > a0 and (i % 2) == color:
                b1 = t
                break
        b2 = columns
        for t in ref:
            if t > b1:
                b2 = t
                break
        mode = bits.read_code(_MODE_DEC)
        if mode == _MODE_P:
            if color:
                row[max(a0, 0):b2] = 1
            a0 = b2
        elif mode == _MODE_H:
            start = max(a0, 0)
            r1 = _read_total_run(bits, color == 0)
            r2 = _read_total_run(bits, color == 1)
            if color:
                row[start:start + r1] = 1
            else:
                row[start + r1:start + r1 + r2] = 1
            a0 = start + r1 + r2
        else:  # vertical
            a1 = b1 + mode
            if a1 < 0 or a1 > columns:
                raise UserError("CCITT vertical move out of range.")
            if color:
                row[max(a0, 0):a1] = 1
            a0 = a1
            color ^= 1
    return row


def _ref_of(row: np.ndarray, columns: int) -> list[int]:
    return sorted(
        set(t for t in _transitions(row) if t < columns)
    ) + [columns, columns]


def decode_g4(data: bytes, columns: int, rows: int | None = None) -> np.ndarray:
    """Decode a pure-2D (T.6 / K<0) stream into (h, columns) uint8 with
    1 = black. `rows` bounds the output; with rows=None decoding stops
    at EOFB or stream end."""

    # Fail-closed cap for corrupted headers: a flipped byte can declare
    # a multi-gigabyte row or page; no real fax/scan comes close.
    if columns <= 0 or columns > 1 << 24 or (
        rows is not None and rows * columns > 1 << 28
    ):
        raise UserError(f"CCITT: implausible image size {columns}x{rows}.")
    bits = _Bits(data)
    out: list[np.ndarray] = []
    # reference line: changing positions (transitions), starts all-white
    ref = [columns, columns]
    while rows is None or len(out) < rows:
        if bits.pos >= bits.n:
            break
        try:
            row = _decode_2d_row(bits, columns, ref)
        except UserError:
            if rows is None and out:
                break  # EOFB / trailing padding
            raise
        out.append(row)
        ref = _ref_of(row, columns)
    if rows is not None and len(out) < rows:
        raise UserError("CCITT stream ended before /Rows rows.")
    if not out:
        raise UserError("Empty CCITT stream.")
    return np.stack(out)


def _try_eol(bits: "_Bits") -> bool:
    """Consume fill zeros + an EOL (000000000001, T.4 §4.1.2) if one
    sits at the current position; restore the position otherwise."""

    save = bits.pos
    zeros = 0
    while bits.pos < bits.n:
        byte = bits.data[bits.pos >> 3]
        bit = (byte >> (7 - (bits.pos & 7))) & 1
        bits.pos += 1
        if bit == 0:
            zeros += 1
            continue
        if zeros >= 11:
            return True
        bits.pos = save
        return False
    bits.pos = save
    return False


def _decode_1d_row(bits: "_Bits", columns: int) -> np.ndarray:
    """One 1D (modified-Huffman) row: alternating white-first total
    runs summing exactly to the row width."""

    row = np.zeros(columns, dtype=np.uint8)
    pos = 0
    white = True
    while pos < columns:
        run = _read_total_run(bits, white)
        if not white:
            row[pos:pos + run] = 1
        pos += run
        white = not white
    if pos != columns:
        raise UserError("CCITT 1D run overflows the row.")
    return row


def decode_g3(
    data: bytes,
    columns: int,
    rows: int | None = None,
    *,
    k: int = 0,
    byte_align: bool = False,
) -> np.ndarray:
    """Decode a Group 3 (T.4) stream into (h, columns) uint8 with
    1 = black. ``k=0``: pure 1D modified-Huffman rows (EOLs optional,
    consumed when present). ``k>0``: mixed mode — every row is
    preceded by an EOL whose trailing tag bit picks 1D (1) or 2D (0)
    coding; a K>0 stream without EOLs is undecodable (the mode bit has
    nowhere to live) and fails closed. ``byte_align`` honours
    /EncodedByteAlign (each row — or EOL — starts on a byte
    boundary)."""

    bits = _Bits(data)
    out: list[np.ndarray] = []
    ref: list[int] | None = None
    while rows is None or len(out) < rows:
        if byte_align and bits.pos & 7:
            bits.pos = (bits.pos + 7) & ~7
        if bits.pos >= bits.n:
            break
        saw_eol = _try_eol(bits)
        if saw_eol and _try_eol(bits):
            # two consecutive EOLs: RTC (return-to-control), T.4 §4.1.3
            break
        two_d = False
        if k > 0:
            if not saw_eol:
                if out:
                    break  # trailing pad after the last row
                raise UserError("CCITT K>0 stream without EOL tags.")
            if bits.pos >= bits.n:
                break
            byte = bits.data[bits.pos >> 3]
            two_d = ((byte >> (7 - (bits.pos & 7))) & 1) == 0
            bits.pos += 1
        try:
            if two_d:
                if ref is None:
                    raise UserError("CCITT 2D row without a reference row.")
                row = _decode_2d_row(bits, columns, ref)
            else:
                row = _decode_1d_row(bits, columns)
        except UserError:
            if rows is None and out:
                break  # trailing padding
            raise
        out.append(row)
        ref = _ref_of(row, columns)
    if rows is not None and len(out) < rows:
        raise UserError("CCITT stream ended before /Rows rows.")
    if not out:
        raise UserError("Empty CCITT stream.")
    return np.stack(out)


def _read_total_run(bits: _Bits, white: bool) -> int:
    total = 0
    table = _WHITE_DEC if white else _BLACK_DEC
    while True:
        r = bits.read_code(table)
        total += r
        if r < 64:
            return total
        # make-up: continue until a terminating (<64) code


class _BitWriter:
    __slots__ = ("bytes_", "acc", "nbits")

    def __init__(self) -> None:
        self.bytes_ = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: str) -> None:
        for ch in code:
            self.acc = (self.acc << 1) | (ch == "1")
            self.nbits += 1
            if self.nbits == 8:
                self.bytes_.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def flush(self) -> bytes:
        if self.nbits:
            self.bytes_.append(self.acc << (8 - self.nbits))
            self.acc = 0
            self.nbits = 0
        return bytes(self.bytes_)


def _write_run(w: _BitWriter, run: int, white: bool) -> None:
    term = _WHITE_TERM if white else _BLACK_TERM
    makeup = _WHITE_MAKEUP if white else _BLACK_MAKEUP
    while run >= 2624:  # 2560 makeup + 63 term ceiling per chunk
        w.write(_EXT_MAKEUP[-1])  # 2560
        run -= 2560
    if run >= 1792:
        idx = (run - 1792) // 64
        w.write(_EXT_MAKEUP[idx])
        run -= 1792 + 64 * idx
    elif run >= 64:
        idx = run // 64 - 1
        w.write(makeup[idx])
        run -= 64 * (idx + 1)
    w.write(term[run])


def _transitions(row: np.ndarray) -> list[int]:
    """Positions where color changes, starting from white at x=0."""

    d = np.flatnonzero(np.diff(row.astype(np.int8)))
    return [int(x) + 1 for x in d] + ([0] if row[0] else [])


def _encode_2d_row(wtr: _BitWriter, row: np.ndarray, ref: list[int], w_: int) -> None:
    cur = sorted(set(_transitions(row))) + [w_, w_]
    a0 = -1
    color = 0
    while a0 < w_:
        b1 = w_
        for i, t in enumerate(ref):
            if t > a0 and (i % 2) == color:
                b1 = t
                break
        b2 = w_
        for t in ref:
            if t > b1:
                b2 = t
                break
        # a1: next transition in current row after a0
        a1 = w_
        for t in cur:
            if t > a0:
                a1 = t
                break
        if b2 < a1:
            wtr.write("0001")  # pass
            a0 = b2
        elif abs(a1 - b1) <= 3:
            off = a1 - b1
            code = {0: "1", 1: "011", 2: "000011", 3: "0000011",
                    -1: "010", -2: "000010", -3: "0000010"}[off]
            wtr.write(code)
            a0 = a1
            color ^= 1
        else:
            # horizontal: two runs from max(a0, 0)
            a2 = w_
            for t in cur:
                if t > a1:
                    a2 = t
                    break
            start = max(a0, 0)
            wtr.write("001")
            _write_run(wtr, a1 - start, color == 0)
            _write_run(wtr, a2 - a1, color == 1)
            a0 = a2


def encode_g4(img: np.ndarray) -> bytes:
    """Encode (h, w) uint8 (nonzero = black) as a T.6 stream + EOFB."""

    h, w_ = img.shape
    wtr = _BitWriter()
    ref = [w_, w_]
    for y in range(h):
        row = (img[y] != 0).astype(np.uint8)
        _encode_2d_row(wtr, row, ref, w_)
        ref = _ref_of(row, w_)
    wtr.write("000000000001" * 2)  # EOFB
    return wtr.flush()


def _encode_1d_row(wtr: _BitWriter, row: np.ndarray, w_: int) -> None:
    trans = sorted(set(_transitions(row))) + [w_]
    pos = 0
    white = True
    for t in trans:
        if t > w_:
            break
        _write_run(wtr, t - pos, white)
        pos = t
        white = not white
    if pos < w_:
        _write_run(wtr, w_ - pos, white)


def encode_g3(
    img: np.ndarray,
    *,
    k: int = 0,
    end_of_line: bool = False,
    byte_align: bool = False,
) -> bytes:
    """Encode (h, w) uint8 (nonzero = black) as a T.4 Group 3 stream.
    ``k=0``: pure 1D rows. ``k>0``: every row gets an EOL + tag bit;
    a 1D anchor row starts each group of k rows, the k-1 rows after it
    code 2D against their predecessor (T.4 §4.2.1 fax convention)."""

    h, w_ = img.shape
    wtr = _BitWriter()
    ref: list[int] | None = None
    for y in range(h):
        if byte_align and wtr.nbits:
            wtr.write("0" * (8 - wtr.nbits))
        if k > 0:
            one_d = y % k == 0
            wtr.write("000000000001" + ("1" if one_d else "0"))
        else:
            one_d = True
            if end_of_line:
                wtr.write("000000000001")
        row = (img[y] != 0).astype(np.uint8)
        if one_d:
            _encode_1d_row(wtr, row, w_)
        else:
            _encode_2d_row(wtr, row, ref, w_)
        ref = _ref_of(row, w_)
    return wtr.flush()


def decode_ccitt_pdf(data: bytes, parms: dict) -> np.ndarray:
    """PDF /CCITTFaxDecode -> (h, w) uint8 GRAY (0/255), honoring
    /BlackIs1 (default false: 0 bits mean black). K < 0: Group 4
    (T.6 pure 2D). K = 0: Group 3 one-dimensional (T.4 MH). K > 0:
    Group 3 mixed mode (EOL tag bits pick 1D/2D per row)."""

    k = int(parms.get("K", 0))
    columns = int(parms.get("Columns", 1728))
    rows = parms.get("Rows")
    nrows = int(rows) if rows is not None else None
    if k < 0:
        bits = decode_g4(data, columns, nrows)
    else:
        bits = decode_g3(
            data, columns, nrows,
            k=k, byte_align=bool(parms.get("EncodedByteAlign")),
        )
    # The decoder yields semantic runs (1 = black run). With the default
    # BlackIs1=false, black runs are 0 bits, which 1-bit DeviceGray
    # renders as black -> gray 0. With BlackIs1=true, black runs are
    # 1 bits -> DeviceGray 1 -> WHITE to a compliant consumer (absent a
    # /Decode), so the gray raster must be inverted to match.
    if parms.get("BlackIs1"):
        return np.where(bits == 1, 255, 0).astype(np.uint8)
    return np.where(bits == 1, 0, 255).astype(np.uint8)
