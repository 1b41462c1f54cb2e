"""JBIG2 (ITU-T T.88) generic-region codec — decode AND encode.

Scope (the scanned-book subset): embedded-organization segment streams
as PDF /JBIG2Decode carries them (segment headers per T.88 §7.2, page
info + immediate generic region + end-of-page), generic region coding
with GB template 0 at the NOMINAL adaptive-pixel positions, optional
TPGDON typical-prediction rows, and the MQ arithmetic coder of T.88
Annex E (the same coder JPEG 2000 uses; the Qe state table is the
published Table E.1). Symbol-dictionary / text-region / refinement
segments and /JBIG2Globals are out of scope and surface as missing
rasters (UserError), never wrong pixels.

Both directions are implemented from the public spec; correctness
evidence is exhaustive encode->decode round-trips (including MQ-coder
stress with random bit/context sequences) — no JBIG2 reference codec
exists in this container to cross-validate against (unlike CCITT's
JDK ImageIO check), which is disclosed here.
"""

from __future__ import annotations

import struct

import numpy as np

from ..errors import UserError

# T.88 Table E.1: (Qe, NMPS, NLPS, SWITCH)
_QE = [
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
]

#: TPGDON pseudo-pixel context (T.88 6.2.5.7, template 0)
_TPGD_CX = 0x9B25

#: nominal AT pixel positions for template 0: A1(3,-1) A2(-3,-1)
#: A3(2,-2) A4(-2,-2) as signed byte pairs
_NOMINAL_AT = bytes([3, 0xFF, 0xFD, 0xFF, 2, 0xFE, 0xFE, 0xFE])

_N_CX = 1 << 16


class MQDecoder:
    """T.88 Annex E arithmetic decoder (software registers)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.bp = 0
        self.c = self._b(0) << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000
        self.cx_i = bytearray(_N_CX)
        self.cx_mps = bytearray(_N_CX)

    def _b(self, off: int = 0) -> int:
        i = self.bp + off
        return self.data[i] if i < len(self.data) else 0xFF

    def _bytein(self) -> None:
        if self._b() == 0xFF:
            if self._b(1) > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp += 1
                self.c += self._b() << 9
                self.ct = 7
        else:
            self.bp += 1
            self.c += self._b() << 8
            self.ct = 8

    def decode(self, cx: int) -> int:
        i = self.cx_i[cx]
        mps = self.cx_mps[cx]
        qe, nmps, nlps, switch = _QE[i]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            if self.a < qe:  # LPS exchange: MPS decision
                d = mps
                self.cx_i[cx] = nmps
            else:
                d = 1 - mps
                if switch:
                    self.cx_mps[cx] = 1 - mps
                self.cx_i[cx] = nlps
            self.a = qe
        else:
            self.c -= qe << 16
            if self.a & 0x8000:
                return mps
            if self.a < qe:  # MPS exchange: LPS decision
                d = 1 - mps
                if switch:
                    self.cx_mps[cx] = 1 - mps
                self.cx_i[cx] = nlps
            else:
                d = mps
                self.cx_i[cx] = nmps
        while True:  # RENORMD
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d


class MQEncoder:
    """T.88 Annex E arithmetic encoder (dummy leading byte absorbs the
    BPST-1 convention; stripped at flush)."""

    def __init__(self) -> None:
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.out = bytearray([0x00])  # dummy BPST-1 byte
        self.cx_i = bytearray(_N_CX)
        self.cx_mps = bytearray(_N_CX)

    def _byteout(self) -> None:
        out = self.out
        if out[-1] == 0xFF:
            out.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
        elif not (self.c & 0x8000000):
            out.append((self.c >> 19) & 0xFF)
            self.c &= 0x7FFFF
            self.ct = 8
        else:
            out[-1] += 1
            if out[-1] == 0xFF:
                self.c &= 0x7FFFFFF
                out.append((self.c >> 20) & 0xFF)
                self.c &= 0xFFFFF
                self.ct = 7
            else:
                out.append((self.c >> 19) & 0xFF)
                self.c &= 0x7FFFF
                self.ct = 8

    def encode(self, d: int, cx: int) -> None:
        i = self.cx_i[cx]
        mps = self.cx_mps[cx]
        qe, nmps, nlps, switch = _QE[i]
        if d == mps:  # CODEMPS
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            self.cx_i[cx] = nmps
        else:  # CODELPS
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                self.cx_mps[cx] = 1 - mps
            self.cx_i[cx] = nlps
        while True:  # RENORME
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def flush(self) -> bytes:
        # SETBITS + two byteouts, in the same register convention as
        # _byteout (integer window at bits 19-26, carry at bit 27)
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.out += b"\xff\xac"  # T.88 E.3.8 terminator
        return bytes(self.out[1:])  # drop the dummy BPST-1 byte


# ---------------------------------------------------------------------------
# Generic region (GB template 0, nominal AT)
# ---------------------------------------------------------------------------

def decode_generic(data: bytes, w: int, h: int, tpgdon: bool = False) -> np.ndarray:
    """MQ-coded generic region -> (h, w) uint8 bits (1 = black)."""

    mq = MQDecoder(data)
    rows: list[list[int]] = []
    zeros = [0] * (w + 4)
    ltp = 0
    for y in range(h):
        if tpgdon:
            ltp ^= mq.decode(_TPGD_CX)
            if ltp:
                rows.append(list(rows[y - 1]) if y > 0 else list(zeros))
                continue
        up1 = rows[y - 1] if y >= 1 else zeros
        up2 = rows[y - 2] if y >= 2 else zeros
        row = [0] * (w + 4)  # 4 trailing pad so windows never index OOB
        w0 = 0
        w1 = (up1[0] << 3) | (up1[1] << 2) | (up1[2] << 1) | up1[3]
        w2 = (up2[0] << 2) | (up2[1] << 1) | up2[2]
        for x in range(w):
            bit = mq.decode((w2 << 11) | (w1 << 4) | w0)
            row[x] = bit
            w0 = ((w0 << 1) | bit) & 0xF
            w1 = ((w1 << 1) | up1[x + 4]) & 0x7F
            w2 = ((w2 << 1) | up2[x + 3]) & 0x1F
        rows.append(row)
    return np.array([r[:w] for r in rows], dtype=np.uint8)


def encode_generic(img: np.ndarray, tpgdon: bool = False) -> bytes:
    """(h, w) 0/1 bits (1 = black) -> MQ-coded generic region data."""

    h, w = img.shape
    mq = MQEncoder()
    pad = np.zeros((h, 4), np.uint8)
    padded = np.concatenate([img, pad], axis=1).tolist()
    zeros = [0] * (w + 4)
    ltp = 0
    for y in range(h):
        up1 = padded[y - 1] if y >= 1 else zeros
        row = padded[y]
        if tpgdon:
            typical = y > 0 and row == up1
            mq.encode(1 if (typical != bool(ltp)) else 0, _TPGD_CX)
            ltp = 1 if typical else 0
            if typical:
                continue
        up2 = padded[y - 2] if y >= 2 else zeros
        w0 = 0
        w1 = (up1[0] << 3) | (up1[1] << 2) | (up1[2] << 1) | up1[3]
        w2 = (up2[0] << 2) | (up2[1] << 1) | up2[2]
        for x in range(w):
            bit = row[x]
            mq.encode(bit, (w2 << 11) | (w1 << 4) | w0)
            w0 = ((w0 << 1) | bit) & 0xF
            w1 = ((w1 << 1) | up1[x + 4]) & 0x7F
            w2 = ((w2 << 1) | up2[x + 3]) & 0x1F
    return mq.flush()


# ---------------------------------------------------------------------------
# Embedded-organization segment stream (PDF /JBIG2Decode payload)
# ---------------------------------------------------------------------------

def _segment(num: int, seg_type: int, payload: bytes, page: int = 1) -> bytes:
    # short header: no referred segments, 1-byte page association
    return (
        struct.pack(">IB", num, seg_type)
        + b"\x00"
        + bytes([page])
        + struct.pack(">I", len(payload))
        + payload
    )


def encode_jbig2_embedded(img: np.ndarray, tpgdon: bool = False) -> bytes:
    """0/1 bitmap -> embedded JBIG2 stream: page info + immediate
    generic region (template 0, nominal AT) + end-of-page."""

    h, w = img.shape
    page_info = struct.pack(">IIII", w, h, 0, 0) + b"\x00" + b"\x00\x00"
    region = (
        struct.pack(">IIII", w, h, 0, 0)
        + b"\x00"  # external combination operator: OR
        + bytes([0x08 if tpgdon else 0x00])  # MMR=0, template 0, TPGDON
        + _NOMINAL_AT
        + encode_generic(img.astype(np.uint8), tpgdon=tpgdon)
    )
    return (
        _segment(0, 48, page_info)
        + _segment(1, 38, region)  # immediate generic region
        + _segment(2, 49, b"")     # end of page
    )


def decode_jbig2_embedded(data: bytes) -> np.ndarray:
    """Embedded JBIG2 stream -> (h, w) uint8 bits (1 = black).

    Supports the generic-region subset; symbol/text/refinement/pattern
    segments raise UserError (missing raster upstream, never wrong
    pixels). Unknown non-region segment types are skipped."""

    pos = 0
    n = len(data)
    page_wh = None
    page: np.ndarray | None = None
    while pos + 11 <= n:
        num, flags = struct.unpack(">IB", data[pos : pos + 5])
        pos += 5
        seg_type = flags & 0x3F
        ref_byte = data[pos]
        ref_count = ref_byte >> 5
        if ref_count == 7:
            raise UserError("JBIG2: long-form referred-segment lists unsupported.")
        pos += 1
        ref_size = 1 if num <= 256 else (2 if num <= 65536 else 4)
        pos += ref_count * ref_size
        pos += 4 if flags & 0x40 else 1  # page association
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        pos += 4
        if length == 0xFFFFFFFF:
            raise UserError("JBIG2: unknown segment length unsupported.")
        payload = data[pos : pos + length]
        pos += length
        if seg_type == 48:  # page info
            w, h = struct.unpack(">II", payload[:8])
            if h == 0xFFFFFFFF:
                raise UserError("JBIG2: unknown page height unsupported.")
            page_wh = (w, h)
            default = (payload[16] >> 2) & 1 if len(payload) > 16 else 0
            page = np.full((h, w), default, np.uint8)
        elif seg_type in (36, 38, 39):  # generic region
            rw, rh, rx, ry = struct.unpack(">IIII", payload[:16])
            genflags = payload[17]
            if genflags & 0x01:
                raise UserError("JBIG2: MMR-coded generic regions unsupported.")
            template = (genflags >> 1) & 0x03
            tpgdon = bool(genflags & 0x08)
            if template != 0:
                raise UserError("JBIG2: only GB template 0 is supported.")
            at = payload[18:26]
            if at != _NOMINAL_AT:
                raise UserError("JBIG2: non-nominal AT pixels unsupported.")
            bits = decode_generic(payload[26:], rw, rh, tpgdon=tpgdon)
            if page is None:
                page_wh = (rw, rh)
                page = np.zeros((rh, rw), np.uint8)
            ph, pw = page.shape
            y1, x1 = min(ph, ry + rh), min(pw, rx + rw)
            if y1 > ry and x1 > rx:
                page[ry:y1, rx:x1] |= bits[: y1 - ry, : x1 - rx]
        elif seg_type in (4, 6, 7, 0, 16, 20, 22, 23, 40, 42, 43):
            raise UserError(
                f"JBIG2: segment type {seg_type} (symbol/text/halftone/"
                "refinement) unsupported."
            )
        # 49/50/51/62: end-of-page/stripe/file, extension — skip
    if page is None:
        raise UserError("JBIG2: no page in stream.")
    return page


def decode_jbig2_pdf(data: bytes, parms: dict) -> np.ndarray:
    """PDF /JBIG2Decode -> (h, w) uint8 GRAY (0/255). JBIG2 1 bits are
    black by definition -> gray 0. /JBIG2Globals streams carry symbol
    dictionaries, which are out of scope."""

    if parms.get("JBIG2Globals") is not None:
        raise UserError("JBIG2: /JBIG2Globals (symbol dictionaries) unsupported.")
    bits = decode_jbig2_embedded(data)
    return np.where(bits == 1, 0, 255).astype(np.uint8)
