"""JPEG codec: baseline sequential AND progressive DCT decode,
baseline encode (ISO/IEC 10918-1 / ITU T.81, public spec only).

The reference gets JPEG support for free from PyMuPDF
(``fitz.open``, reference render.py:89); this container has no image
codecs, so the engine owns one — the same pattern as pdfio/png.py.

- decoder: SOI/APPn/COM/DQT/SOF0/1/2/DHT/DRI/SOS/RSTn/EOI marker
  walk, canonical Huffman tables (spec DECODE semantics via a 16-bit
  peek LUT), persistent per-component coefficient stores filled scan
  by scan — progressive (SOF2) spectral-selection and successive-
  approximation scans implement T.81 §G.2 (DC first/refine, AC
  first/refine with EOB runs; cross-validated bit-exact against JVM
  ImageIO in tests/test_jpeg.py) — then one dequantize + batched
  orthonormal IDCT, chroma upsampling for sampling factors in {1, 2}
  (4:4:4, 4:2:2, 4:4:0, 4:2:0), JFIF YCbCr -> RGB. Grayscale decodes
  to (h, w) uint8, color to (h, w, 3). Arithmetic/12-bit/hierarchical
  streams raise UserError.
- encoder: quality-scaled Annex K quantization tables, Annex K Huffman
  tables, 4:4:4 or 4:2:0 (2x2 luma MCUs with box-averaged chroma —
  the real scanner-output shape), optional DRI/RSTm restart intervals
  (§F.1.2.3: byte-aligned resegmentation with DC-predictor resets,
  cross-read live against JDK ImageIO in tests), batched FDCT,
  run-length + magnitude entropy coding.

Everything is deterministic (pure integer/float64 numpy + fixed
rounding), which the content-addressed media_refs require: the same
JPEG bytes decode to the same pixels on every executor.
"""

from __future__ import annotations

import struct

import numpy as np

from ..errors import UserError

# --- constants (ISO/IEC 10918-1 Annex K) ---

#: zigzag scan: position k in the scan -> row-major index in the block
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)

_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)

# Annex K Huffman table specs: (BITS[1..16], HUFFVAL)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

#: Orthonormal 8x8 DCT-II matrix: FDCT F = A @ B @ A.T, IDCT B = A.T @ F @ A.
_A = np.array([
    [
        (np.sqrt(1.0 / 8.0) if k == 0 else np.sqrt(2.0 / 8.0))
        * np.cos((2 * n + 1) * k * np.pi / 16.0)
        for n in range(8)
    ]
    for k in range(8)
])


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) per the spec's canonical assignment."""

    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_lut(bits: list[int], vals: list[int]) -> tuple[list[int], list[int]]:
    """16-bit-peek decode LUT: peek -> (symbol, code length). Implements
    the spec DECODE procedure as one table lookup per symbol."""

    sym = np.zeros(1 << 16, dtype=np.int32)
    ln = np.zeros(1 << 16, dtype=np.int32)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            sym[lo:hi] = vals[k]
            ln[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    return sym.tolist(), ln.tolist()


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex K base tables (public libjpeg
    formula): scale = 5000/q below 50, else 200 - 2q."""

    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    luma = np.clip((_Q_LUMA * scale + 50) // 100, 1, 255)
    chroma = np.clip((_Q_CHROMA * scale + 50) // 100, 1, 255)
    return luma, chroma


def _blockify(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad (edge-replicate) to multiples of 8 and return
    (n_blocks, 8, 8) float64 blocks in MCU raster order."""

    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = plane.shape
    blocks = (
        plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    return blocks.astype(np.float64), hh // 8, ww // 8


def _deblockify(blocks: np.ndarray, bh: int, bw: int, h: int, w: int) -> np.ndarray:
    plane = (
        blocks.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    )
    return plane[:h, :w]


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.buf = (self.buf << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.buf >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self.buf &= (1 << self.nbits) - 1

    def flush(self) -> None:
        pad = (-self.nbits) % 8
        if pad:
            self.write((1 << pad) - 1, pad)  # pad final byte with 1s
        self.buf = 0
        self.nbits = 0


def _size_cat(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_blocks(
    writer: _BitWriter,
    quant_blocks: list[np.ndarray],
    comp_of_block: list[int],
    dc_codes: list[dict],
    ac_codes: list[dict],
    blocks_per_mcu: int = 0,
    restart_interval: int = 0,
) -> None:
    """Entropy-encode quantized blocks in interleaved order. With
    ``restart_interval`` (in MCUs), an RSTm marker (m cycling 0-7) is
    emitted every Ri MCUs: the bitstream pads to a byte boundary with
    1s and the DC predictors reset (T.81 §F.1.2.3) — the
    error-resilience layout scanner firmware emits."""

    preds = [0] * (max(comp_of_block) + 1)
    blk_idx = 0
    for blk, ci in zip(quant_blocks, comp_of_block):
        if (
            restart_interval
            and blk_idx
            and blk_idx % (restart_interval * blocks_per_mcu) == 0
        ):
            writer.flush()
            m = (blk_idx // (restart_interval * blocks_per_mcu) - 1) % 8
            writer.out += bytes([0xFF, 0xD0 + m])
            preds = [0] * len(preds)
        blk_idx += 1
        zz = blk.reshape(64)[ZIGZAG].astype(np.int64)
        dc_tbl, ac_tbl = dc_codes[ci], ac_codes[ci]
        diff = int(zz[0]) - preds[ci]
        preds[ci] = int(zz[0])
        size = _size_cat(diff)
        code, ln = dc_tbl[size]
        writer.write(code, ln)
        if size:
            writer.write(diff if diff > 0 else diff + (1 << size) - 1, size)
        run = 0
        nz = np.nonzero(zz[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_tbl[0xF0]  # ZRL
                writer.write(code, ln)
                run -= 16
            size = _size_cat(v)
            code, ln = ac_tbl[(run << 4) | size]
            writer.write(code, ln)
            writer.write(v if v > 0 else v + (1 << size) - 1, size)
            run = 0
        if last < 63:
            code, ln = ac_tbl[0x00]  # EOB
            writer.write(code, ln)


def _dht_segment(tc: int, th: int, spec: tuple[list[int], list[int]]) -> bytes:
    bits, vals = spec
    payload = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + (len(payload) + 2).to_bytes(2, "big") + payload


def _dqt_segment(tq: int, table: np.ndarray) -> bytes:
    payload = bytes([tq]) + bytes(int(v) for v in table.reshape(64)[ZIGZAG])
    return b"\xff\xdb" + (len(payload) + 2).to_bytes(2, "big") + payload


def encode_jpeg(
    arr: np.ndarray, *, quality: int = 75, subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode a (h, w) gray or (h, w, 3) RGB uint8 array as a baseline
    sequential JFIF JPEG (Annex K tables at the given quality).
    ``subsample``: "444" (one block per component per MCU) or "420"
    (2x2 luma sampling with box-averaged chroma — what real scanner
    output ships). ``restart_interval`` emits a DRI segment and RSTm
    markers every that many MCUs (0 = none)."""

    if arr.dtype != np.uint8 or arr.ndim not in (2, 3) or (
        arr.ndim == 3 and arr.shape[2] != 3
    ):
        raise ValueError(f"expected (h, w) or (h, w, 3) uint8, got {arr.shape} {arr.dtype}")
    h, w = arr.shape[:2]
    luma_q, chroma_q = _quality_tables(quality)
    if arr.ndim == 2:
        planes = [arr.astype(np.float64)]
        qids = [0]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
        qids = [0, 1, 1]
    qtables = [luma_q.reshape(8, 8), chroma_q.reshape(8, 8)]
    use_420 = subsample == "420" and len(planes) == 3
    samplings = [(2, 2), (1, 1), (1, 1)] if use_420 else [(1, 1)] * len(planes)

    if use_420:
        # Pad luma to 16-multiples, box-average chroma 2x2.
        ph, pw = -h % 16, -w % 16
        padded = [
            np.pad(p, ((0, ph), (0, pw)), mode="edge") if (ph or pw) else p
            for p in planes
        ]
        y = padded[0]
        chroma = [
            (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
            for p in padded[1:]
        ]
        enc_planes = [y] + chroma
    else:
        enc_planes = planes

    all_blocks: list[np.ndarray] = []
    comp_of_block: list[int] = []
    per_comp_blocks: list[np.ndarray] = []
    grids: list[tuple[int, int]] = []
    for ci, plane in enumerate(enc_planes):
        blocks, gbh, gbw = _blockify(np.clip(plane, 0, 255) - 128.0)
        coeffs = np.einsum("km,nmp,pq->nkq", _A, blocks, _A.T)
        q = qtables[qids[ci]]
        quant = np.sign(coeffs) * np.floor(np.abs(coeffs) / q + 0.5)
        per_comp_blocks.append(quant)
        grids.append((gbh, gbw))
    # interleaved MCU order
    if use_420:
        ybh, ybw = grids[0]
        for my in range(ybh // 2):
            for mx in range(ybw // 2):
                for byi in range(2):
                    for bxi in range(2):
                        all_blocks.append(
                            per_comp_blocks[0][(my * 2 + byi) * ybw + mx * 2 + bxi]
                        )
                        comp_of_block.append(0)
                for ci in (1, 2):
                    all_blocks.append(per_comp_blocks[ci][my * grids[ci][1] + mx])
                    comp_of_block.append(ci)
    else:
        bh, bw = grids[0]
        for bi in range(bh * bw):
            for ci in range(len(enc_planes)):
                all_blocks.append(per_comp_blocks[ci][bi])
                comp_of_block.append(ci)

    dc_codes = [_canonical_codes(*_DC_LUMA), _canonical_codes(*_DC_CHROMA)]
    ac_codes = [_canonical_codes(*_AC_LUMA), _canonical_codes(*_AC_CHROMA)]
    ncomp = len(planes)
    dc_by_comp = [dc_codes[qids[c]] for c in range(ncomp)]
    ac_by_comp = [ac_codes[qids[c]] for c in range(ncomp)]

    blocks_per_mcu = 6 if use_420 else len(enc_planes)
    writer = _BitWriter()
    _encode_blocks(
        writer, all_blocks, comp_of_block, dc_by_comp, ac_by_comp,
        blocks_per_mcu=blocks_per_mcu,
        restart_interval=restart_interval,
    )
    writer.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"  # APP0
    out += _dqt_segment(0, luma_q)
    if ncomp == 3:
        out += _dqt_segment(1, chroma_q)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for c in range(ncomp):
        hs, vs = samplings[c]
        sof += bytes([c + 1, (hs << 4) | vs, qids[c]])
    out += b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
    out += _dht_segment(0, 0, _DC_LUMA) + _dht_segment(1, 0, _AC_LUMA)
    if ncomp == 3:
        out += _dht_segment(0, 1, _DC_CHROMA) + _dht_segment(1, 1, _AC_CHROMA)
    if restart_interval:
        out += b"\xff\xdd\x00\x04" + restart_interval.to_bytes(2, "big")
    sos = bytes([ncomp])
    for c in range(ncomp):
        td_ta = 0x00 if qids[c] == 0 else 0x11
        sos += bytes([c + 1, td_ta])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder ---


def _split_entropy_segments(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Unstuff the scan's entropy bytes, splitting on RSTn markers.
    Returns (segments, position of the terminating marker's 0xFF)."""

    segments: list[bytes] = []
    cur = bytearray()
    n = len(data)
    while pos < n:
        b = data[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        nxt = data[pos + 1] if pos + 1 < n else 0xD9
        if nxt == 0x00:  # stuffed FF
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= nxt <= 0xD7:  # restart marker
            segments.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:  # real marker terminates the scan
            break
    segments.append(bytes(cur))
    return segments, pos


class _SegDecoder:
    """Bit-serial Huffman decoder over one unstuffed entropy segment."""

    __slots__ = ("data", "pos", "buf", "nb", "n")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nb = 0
        self.n = len(data)

    def _fill16(self) -> None:
        while self.nb < 16:
            byte = self.data[self.pos] if self.pos < self.n else 0
            self.pos += 1
            self.buf = ((self.buf << 8) | byte) & 0xFFFFFFFF
            self.nb += 8

    def read_symbol(self, lut_sym: list[int], lut_len: list[int]) -> int:
        if self.nb < 16:
            self._fill16()
        peek = (self.buf >> (self.nb - 16)) & 0xFFFF
        length = lut_len[peek]
        if length == 0:
            raise UserError("Corrupt JPEG: invalid Huffman code.")
        self.nb -= length
        return lut_sym[peek]

    def get_bits(self, size: int) -> int:
        """Raw bits (EOB-run lengths, refinement/correction bits)."""

        if size == 0:
            return 0
        if self.nb < size:
            self._fill16()
        v = (self.buf >> (self.nb - size)) & ((1 << size) - 1)
        self.nb -= size
        return v

    def receive_extend(self, size: int) -> int:
        if size == 0:
            return 0
        if self.nb < size:
            self._fill16()
        v = (self.buf >> (self.nb - size)) & ((1 << size) - 1)
        self.nb -= size
        if v < (1 << (size - 1)):
            v -= (1 << size) - 1
        return v


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline-sequential OR progressive JPEG to (h, w) gray
    or (h, w, 3) RGB uint8. Raises UserError on arithmetic/12-bit/
    hierarchical or corrupt streams."""

    try:
        return _decode_jpeg(data)
    except UserError:
        raise
    except (IndexError, ValueError, KeyError, OverflowError,
            ZeroDivisionError, struct.error) as exc:
        # truncated/corrupt segments — fail closed, never a raw exception
        raise UserError(f"Corrupt JPEG stream: {type(exc).__name__}.") from exc


def _decode_jpeg(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise UserError("Not a JPEG: missing SOI.")
    pos = 2
    n = len(data)
    qtables: dict[int, np.ndarray] = {}
    huff_luts: dict[tuple[int, int], tuple[list[int], list[int]]] = {}
    frame = None  # (h, w, comps, progressive) comps: list of (cid, hs, vs, tq)
    restart_interval = 0
    # Persistent per-component coefficient stores: progressive scans
    # accumulate into them across SOS segments (and multi-scan
    # sequential files no longer lose earlier components); the IDCT
    # runs ONCE at end of frame.
    stores: dict[int, np.ndarray] = {}
    grids: dict[int, tuple[int, int]] = {}     # padded (cb_h, cb_w)
    nbdims: dict[int, tuple[int, int]] = {}    # non-interleaved (nb_h, nb_w)
    geom = None
    scans_decoded = 0

    while pos < n:
        if data[pos] != 0xFF:
            pos += 1  # tolerate stray bytes
            continue
        # T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
        # fill bytes — skip the run so the marker code is the byte AFTER
        # the last 0xFF, not a second 0xFF read as a bogus code.
        while pos + 1 < n and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= n:
            break
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = int.from_bytes(data[pos : pos + 2], "big")
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 0x0F
                bp += 1
                if pq == 0:
                    tbl = np.frombuffer(body[bp : bp + 64], dtype=np.uint8).astype(np.float64)
                    bp += 64
                else:
                    tbl = np.frombuffer(body[bp : bp + 128], dtype=">u2").astype(np.float64)
                    bp += 128
                nat = np.zeros(64)
                nat[ZIGZAG] = tbl
                qtables[tq] = nat.reshape(8, 8)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            precision = body[0]
            if precision != 8:
                raise UserError(f"Unsupported JPEG precision {precision}.")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            if h * w > 1 << 28 or h == 0 or w == 0:
                raise UserError(f"Implausible JPEG size {w}x{h}.")
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c], body[7 + 3 * c], body[8 + 3 * c]
                hs, vs = hv >> 4, hv & 0x0F
                if hs not in (1, 2) or vs not in (1, 2):
                    raise UserError(f"Unsupported JPEG sampling {hs}x{vs}.")
                comps.append((cid, hs, vs, tq))
            frame = (h, w, comps, marker == 0xC2)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            geom = (hmax, vmax, mcux, mcuy)
            for cid, hs, vs, _tq in comps:
                cb_h, cb_w = mcuy * vs, mcux * hs
                stores[cid] = np.zeros((cb_h * cb_w, 64), dtype=np.int32)
                grids[cid] = (cb_h, cb_w)
                nbdims[cid] = (
                    ((h * vs + vmax - 1) // vmax + 7) // 8,
                    ((w * hs + hmax - 1) // hmax + 7) // 8,
                )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCB, 0xCD, 0xCE, 0xCF):
            raise UserError("Unsupported JPEG process (sequential/progressive DCT only).")
        elif marker == 0xC8:
            raise UserError("Unsupported JPEG process (sequential/progressive DCT only).")
        elif marker == 0xCA:
            raise UserError("Unsupported JPEG process (sequential/progressive DCT only).")
        elif marker == 0xC4:  # DHT
            bp = 0
            while bp < len(body):
                tc, th = body[bp] >> 4, body[bp] & 0x0F
                bits = list(body[bp + 1 : bp + 17])
                nv = sum(bits)
                vals = list(body[bp + 17 : bp + 17 + nv])
                huff_luts[(tc, th)] = _decode_lut(bits, vals)
                bp += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise UserError("JPEG SOS before SOF.")
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c], body[2 + 2 * c]
                scan_comps.append((cs, tdta >> 4, tdta & 0x0F))
            ss = body[1 + 2 * ns]
            se = body[2 + 2 * ns]
            ahl = body[3 + 2 * ns]
            ah, al = ahl >> 4, ahl & 0x0F
            pos = pos + seglen
            pos = _decode_scan(
                data, pos, frame, geom, scan_comps, huff_luts,
                restart_interval, stores, grids, nbdims, ss, se, ah, al,
            )
            scans_decoded += 1
            continue
        pos += seglen

    if frame is None or not scans_decoded:
        raise UserError("JPEG has no decoded scan.")
    h, w, comps, _prog = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = []
    for cid, hs, vs, tq in comps:
        cb_h, cb_w = grids[cid]
        blocks = stores[cid].astype(np.float64).reshape(-1, 8, 8) * qtables[tq][None, :, :]
        pix = np.einsum("km,nmp,pq->nkq", _A.T, blocks, _A) + 128.0
        pix = np.clip(np.floor(pix + 0.5), 0, 255)
        plane = _deblockify(pix, cb_h, cb_w, cb_h * 8, cb_w * 8)
        if hs != hmax or vs != vmax:  # chroma upsampling (replication)
            plane = np.repeat(np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1)
        planes.append(plane[:h, :w].astype(np.float64))
    if len(planes) == 1:
        return np.clip(planes[0], 0, 255).astype(np.uint8)
    if len(planes) != 3:
        raise UserError(f"Unsupported JPEG component count {len(planes)}.")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)


def _decode_scan(
    data, pos, frame, geom, scan_comps, huff_luts, restart_interval,
    stores, grids, nbdims, ss, se, ah, al,
):
    """Decode one entropy-coded scan into the persistent coefficient
    stores. Sequential scans carry ss=0/se=63/ah=al=0; progressive
    scans (SOF2) carry the spectral-selection / successive-
    approximation parameters and use the T.81 §G.2 procedures
    (DC first/refine, AC first/refine with EOB runs)."""

    h, w, comps, progressive = frame
    by_id = {c[0]: c for c in comps}
    hmax, vmax, mcux, mcuy = geom

    interleaved = len(scan_comps) > 1
    if progressive and ss > 0 and interleaved:
        raise UserError("Corrupt JPEG: progressive AC scan must be single-component.")
    if not interleaved:
        cid = scan_comps[0][0]
        nb_h, nb_w = nbdims[cid]
        total_mcus = nb_h * nb_w
    else:
        total_mcus = mcux * mcuy

    dc_first = ss == 0 and ah == 0
    dc_refine = ss == 0 and ah > 0
    zz = ZIGZAG.tolist()
    p1, m1 = 1 << al, -1 << al

    segments, endpos = _split_entropy_segments(data, pos)

    mcu = 0
    for seg in segments:
        if mcu >= total_mcus:
            break
        dec = _SegDecoder(seg)
        preds = {c[0]: 0 for c in scan_comps}
        eobrun = 0
        seg_budget = restart_interval if restart_interval else total_mcus - mcu
        for _ in range(min(seg_budget, total_mcus - mcu)):
            for cs, td, ta in scan_comps:
                _, hs, vs, _tq = by_id[cs]
                nb_v = vs if interleaved else 1
                nb_h_ = hs if interleaved else 1
                _, cb_w = grids[cs]
                store = stores[cs]
                for byi in range(nb_v):
                    for bxi in range(nb_h_):
                        if interleaved:
                            my, mx = divmod(mcu, mcux)
                            row = my * vs + byi
                            col = mx * hs + bxi
                        else:
                            row, col = divmod(mcu, nbdims[cs][1])
                        idx = row * cb_w + col
                        if not progressive:
                            blk = [0] * 64
                            _seq_block(dec, blk, huff_luts[(0, td)],
                                       huff_luts[(1, ta)], preds, cs, zz)
                            store[idx] = blk
                        elif dc_first:
                            sym = dec.read_symbol(*huff_luts[(0, td)])
                            preds[cs] += dec.receive_extend(sym)
                            store[idx, 0] = preds[cs] << al
                        elif dc_refine:
                            if dec.get_bits(1):
                                store[idx, 0] |= p1
                        else:
                            blk = store[idx]
                            if ah == 0:
                                eobrun = _ac_first_block(
                                    dec, blk, huff_luts[(1, ta)], ss, se, al,
                                    eobrun, zz)
                            else:
                                eobrun = _ac_refine_block(
                                    dec, blk, huff_luts[(1, ta)], ss, se,
                                    p1, m1, eobrun, zz)
            mcu += 1
    if mcu < total_mcus:
        raise UserError("Corrupt JPEG: truncated scan.")
    return endpos


def _seq_block(dec, blk, dc_lut, ac_lut, preds, cs, zz):
    """One baseline-sequential data unit (DC diff + AC run-lengths)."""

    s = dec.read_symbol(*dc_lut)
    preds[cs] += dec.receive_extend(s)
    blk[0] = preds[cs]
    k = 1
    while k < 64:
        rs = dec.read_symbol(*ac_lut)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise UserError("Corrupt JPEG: AC index overflow.")
        blk[zz[k]] = dec.receive_extend(s)
        k += 1


def _ac_first_block(dec, blk, ac_lut, ss, se, al, eobrun, zz):
    """Progressive AC scan, first pass (Ah=0): T.81 G.2.2 with EOB
    runs; new coefficients land shifted left by Al."""

    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = dec.read_symbol(*ac_lut)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16
                continue
            eobrun = 1 << r
            if r:
                eobrun += dec.get_bits(r)
            return eobrun - 1  # this block ends the run too
        k += r
        if k > se:
            raise UserError("Corrupt JPEG: AC index overflow.")
        blk[zz[k]] = dec.receive_extend(s) << al
        k += 1
    return 0


def _ac_refine_block(dec, blk, ac_lut, ss, se, p1, m1, eobrun, zz):
    """Progressive AC scan, refinement pass (Ah>0): T.81 G.2.3 —
    correction bits for history-nonzero coefficients interleave with
    newly significant ones (same control flow as the widely-documented
    libjpeg decode_mcu_AC_refine)."""

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = dec.read_symbol(*ac_lut)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s:
                if s != 1:
                    raise UserError("Corrupt JPEG: bad refinement magnitude.")
                newval = p1 if dec.get_bits(1) else m1
            else:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += dec.get_bits(r)
                    break  # EOB-run correction loop below finishes the block
            while k <= se:
                z = zz[k]
                if blk[z] != 0:
                    if dec.get_bits(1) and (blk[z] & p1) == 0:
                        blk[z] += p1 if blk[z] >= 0 else m1
                else:
                    if r == 0:
                        if s:
                            blk[z] = newval
                        break
                    r -= 1
                k += 1
            k += 1
    if eobrun > 0:
        while k <= se:
            z = zz[k]
            if blk[z] != 0:
                if dec.get_bits(1) and (blk[z] & p1) == 0:
                    blk[z] += p1 if blk[z] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun
