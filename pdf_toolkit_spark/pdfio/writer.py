"""Deterministic minimal PDF writer (classic 1.4 layout, or 1.5 with
object + cross-reference streams via ``pdf15=True``).

Produces real PDF files: xref table, catalog/pages tree, per-page
content streams (text shown with BT/Tf/Td/Tj/ET, images placed with
cm + Do), grayscale and RGB image XObjects (FlateDecode), /Rotate page keys.
No timestamps, no random IDs — byte-identical output for identical
input, which makes media_refs and resume tests reproducible.

Coordinates: callers use raster pixel coords (row 0 = top). The writer
converts to PDF user space (y-up) with 1 unit = 1 pixel and MediaBox =
raster dims.
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass, field
from typing import Union

import numpy as np

from ..errors import UserError

#: Ordered page content item: ("text", str, row, col) or
#: ("image", np.ndarray gray, row, col). Stream order = span order.
TextItem = tuple[str, str, int, int]
ImageItem = tuple[str, np.ndarray, int, int]
Item = Union[TextItem, ImageItem]


@dataclass
class PageSpec:
    """One page to write: a full-page scan raster plus ordered items."""

    raster: np.ndarray                    # (h, w) uint8, stored orientation
    rotate: int = 0                       # /Rotate: 0|90|180|270
    items: list[Item] = field(default_factory=list)
    #: image codec for this page's rasters: "flate" (lossless),
    #: "jpeg" (DCTDecode, baseline via pdfio/jpeg.py — what real
    #: scanned PDFs ship), "ccitt" (Group-4 fax via pdfio/ccitt.py),
    #: "ccittg3" (Group-3 K=2 mixed mode), "jbig2" (T.88 generic
    #: region via pdfio/jbig2.py), "jbig2m" (MMR generic region),
    #: "jbig2r" (lossy base + refinement region), "jbig2h" (halftone
    #: pattern stamping, lossy), "jbig2s" (T.88 symbol dictionary +
    #: text region with a /JBIG2Globals stream), "jbig2sr" (SDREFAGG
    #: refinement-coded dictionary + SBREFINE refined instances — the
    #: lossy-cluster + refine-to-lossless symbol flow, still
    #: bit-exact), "jbig2huf" (SDHUFF/SBHUFF Huffman organization
    #: with user code tables — the low-memory hardware profile),
    #: "jbig2hufstd" (SDHUFF/SBHUFF with the predefined Annex B
    #: table selections B.4/B.2/B.6/B.8/B.11 — what fax-era hardware
    #: encoders actually emit), "jbig2hufalt" (the alternate
    #: predefined selections B.5/B.3/B.7/B.10/B.13, covering the
    #: signed/wide companion tables), "jbig2hufsr" (SDHUFF x
    #: SDREFAGG: a split dictionary whose second half is
    #: refinement-coded against the first, Huffman organization),
    #: "jpx" (lossless
    #: JPEG 2000 via pdfio/jpx.py), "jpx97" (lossy 9/7 JPEG 2000,
    #: derived QCD), "jpxq" (lossy with per-component QCC
    #: signalling), "jpxcoc" (lossless with per-component COC
    #: depth/geometry/style overrides), "jpxtile" (lossy multi-tile
    #: with tile-part-header QCD rate overrides), or "jpxbyp" (lossy 9/7 with the selective-bypass
    #: + vertically-causal code-block styles — production encoders'
    #: speed knobs); the 1-bit codecs threshold gray rasters at >127
    codec: str = "flate"


def _escape_pdf_string(text: str) -> bytes:
    out = []
    for ch in text.encode("latin-1", errors="replace"):
        if ch in (0x5C, 0x28, 0x29):  # backslash, ( , )
            out.append(0x5C)
        out.append(ch)
    return bytes(out)


def _tounicode_cmap(code_to_char: dict[int, str]) -> bytes:
    """ToUnicode CMap stream body (Adobe CMap format, §9.10.3):
    2-byte codespace + bfchar blocks of <=100 entries."""

    lines = [
        b"/CIDInit /ProcSet findresource begin",
        b"12 dict begin",
        b"begincmap",
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) /Supplement 0 >> def",
        b"/CMapName /Adobe-Identity-UCS def",
        b"/CMapType 2 def",
        b"1 begincodespacerange",
        b"<0000> <FFFF>",
        b"endcodespacerange",
    ]
    items = sorted(code_to_char.items())
    for i in range(0, len(items), 100):
        chunk = items[i : i + 100]
        lines.append(b"%d beginbfchar" % len(chunk))
        for code, ch in chunk:
            lines.append(
                b"<%04x> <%s>" % (code, ch.encode("utf-16-be").hex().encode())
            )
        lines.append(b"endbfchar")
    lines += [
        b"endcmap",
        b"CMapName currentdict /CMap defineresource pop",
        b"end",
        b"end",
    ]
    return b"\n".join(lines)


class _Builder:
    """Accumulates numbered objects and emits the xref + trailer."""

    def __init__(self) -> None:
        self._objects: list[bytes | None] = [None]  # 1-based

    def reserve(self) -> int:
        self._objects.append(None)
        return len(self._objects) - 1

    def set(self, num: int, body: bytes) -> None:
        self._objects[num] = body

    def add(self, body: bytes) -> int:
        num = self.reserve()
        self.set(num, body)
        return num

    def render(self, root_num: int, *, pdf15: bool = False,
               encrypt: "tuple | None" = None) -> bytes:
        if pdf15:
            return self._render_pdf15(root_num, encrypt=encrypt)
        header = b"%PDF-1.4\n%\xc2\xb5\xc2\xb6\n"
        out = bytearray(header)
        offsets = [0]
        for num, body in enumerate(self._objects):
            if num == 0:
                continue
            body = body or b"null"
            if encrypt is not None and num != encrypt[0]:
                body = _encrypt_streams_in_body(
                    body, num, encrypt[2],
                    aes=(encrypt[3] if len(encrypt) > 3 else False) or False,
                )
            offsets.append(len(out))
            out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
        xref_at = len(out)
        n = len(self._objects)
        out += f"xref\n0 {n}\n".encode()
        out += b"0000000000 65535 f \n"
        for off in offsets[1:]:
            out += f"{off:010d} 00000 n \n".encode()
        trailer = f"<< /Size {n} /Root {root_num} 0 R"
        if encrypt is not None:
            idhex = encrypt[1].hex()
            trailer += f" /Encrypt {encrypt[0]} 0 R /ID [<{idhex}> <{idhex}>]"
        trailer += " >>"
        out += (
            f"trailer\n{trailer}\n"
            f"startxref\n{xref_at}\n%%EOF\n"
        ).encode()
        return bytes(out)

    def _render_pdf15(self, root_num: int, encrypt: "tuple | None" = None) -> bytes:
        """PDF 1.5 layout: non-stream objects packed into one object
        stream (/Type /ObjStm, §7.5.7), cross-reference emitted as a
        /Type /XRef stream (§7.5.8) with W [1 4 2]. Deterministic like
        the classic path.

        With encryption: top-level stream payloads encrypt per object;
        the ObjStm's own stream encrypts with ITS object key while the
        objects packed inside are NOT individually encrypted (§7.6.1 —
        their strings are protected by the ObjStm encryption); the
        /Encrypt dictionary and the XRef stream stay plaintext."""

        out = bytearray(b"%PDF-1.5\n%\xc2\xb5\xc2\xb6\n")
        objstm_num = len(self._objects)
        xref_num = objstm_num + 1
        top: list[int] = []
        comp: list[int] = []
        for num in range(1, len(self._objects)):
            body = self._objects[num] or b"null"
            if encrypt is not None and num == encrypt[0]:
                top.append(num)  # /Encrypt must stay direct + plaintext
            else:
                (top if b"\nstream\n" in body else comp).append(num)
        entries: dict[int, tuple[int, int, int]] = {0: (0, 0, 65535)}
        for num in top:
            body = self._objects[num] or b"null"
            if encrypt is not None and num != encrypt[0]:
                body = _encrypt_streams_in_body(
                    body, num, encrypt[2],
                    aes=(encrypt[3] if len(encrypt) > 3 else False) or False,
                )
            entries[num] = (1, len(out), 0)
            out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
        if comp:
            blob = bytearray()
            offs: list[int] = []
            for num in comp:
                offs.append(len(blob))
                blob += (self._objects[num] or b"null") + b"\n"
            hdr = " ".join(f"{n} {o}" for n, o in zip(comp, offs)).encode() + b"\n"
            packed = bytes(hdr) + bytes(blob)
            if encrypt is not None:
                from .crypt import object_key, rc4

                aes = (encrypt[3] if len(encrypt) > 3 else False) or False
                if aes:
                    import hashlib

                    from .aes import cbc_encrypt

                    iv = hashlib.md5(b"iv:%d" % objstm_num).digest()
                    okey = (encrypt[2] if aes == "256"
                            else object_key(encrypt[2], objstm_num, 0, aes=True))
                    payload = cbc_encrypt(okey, iv, zlib.compress(packed, 6))
                else:
                    payload = rc4(
                        object_key(encrypt[2], objstm_num, 0), zlib.compress(packed, 6)
                    )
            else:
                payload = zlib.compress(packed, 6)
            entries[objstm_num] = (1, len(out), 0)
            out += (
                f"{objstm_num} 0 obj\n<< /Type /ObjStm /N {len(comp)} /First {len(hdr)} "
                f"/Filter /FlateDecode /Length {len(payload)} >>\nstream\n"
            ).encode() + payload + b"\nendstream\nendobj\n"
            for idx, num in enumerate(comp):
                entries[num] = (2, objstm_num, idx)
        size = xref_num + 1
        xref_at = len(out)
        entries[xref_num] = (1, xref_at, 0)
        rows = bytearray()
        for num in range(size):
            t, f2, f3 = entries.get(num, (0, 0, 65535))
            rows += bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")
        xdata = zlib.compress(bytes(rows), 6)
        enc_entry = ""
        if encrypt is not None:
            idhex = encrypt[1].hex()
            enc_entry = f"/Encrypt {encrypt[0]} 0 R /ID [<{idhex}> <{idhex}>] "
        out += (
            f"{xref_num} 0 obj\n<< /Type /XRef /Size {size} /W [1 4 2] /Index [0 {size}] "
            f"/Root {root_num} 0 R {enc_entry}/Filter /FlateDecode /Length {len(xdata)} >>\nstream\n"
        ).encode() + xdata + b"\nendstream\nendobj\n"
        out += f"startxref\n{xref_at}\n%%EOF\n".encode()
        return bytes(out)


def _encrypt_streams_in_body(
    body: bytes, num: int, file_key: bytes, aes: "bool | str" = False
) -> bytes:
    """Encrypt the stream payload of an object body (strings in this
    writer's output live only inside content streams, so stream
    encryption covers everything). RC4 is length-preserving; AESV2
    grows the payload (IV + padding), so /Length is rewritten."""

    marker = b"\nstream\n"
    at = body.find(marker)
    if at == -1:
        return body
    start = at + len(marker)
    end = body.rindex(b"\nendstream")
    from .crypt import object_key, rc4

    if aes:
        import hashlib

        from .aes import cbc_encrypt

        iv = hashlib.md5(b"iv:%d" % num).digest()  # deterministic fixture IV
        key = file_key if aes == "256" else object_key(file_key, num, 0, aes=True)
        payload = cbc_encrypt(key, iv, body[start:end])
        head = re.sub(
            rb"/Length \d+", b"/Length %d" % len(payload), body[:at], count=1
        )
        return head + marker + payload + body[end:]
    payload = rc4(object_key(file_key, num, 0), body[start:end])
    return body[:start] + payload + body[end:]


def _image_xobject(
    arr: np.ndarray, codec: str = "flate", builder: "_Builder | None" = None,
) -> bytes:
    h, w = arr.shape[:2]
    cs = "DeviceRGB" if arr.ndim == 3 else "DeviceGray"
    if codec in (
        "jbig2s", "jbig2sr", "jbig2huf", "jbig2hufstd", "jbig2hufalt",
        "jbig2hufsr",
    ) and arr.ndim == 2:
        from .jbig2 import encode_jbig2_symbol_text

        sym_kw = {}
        if codec == "jbig2sr":
            sym_kw = {"refine_instances": True, "refagg_dict": True}
        elif codec == "jbig2huf":
            sym_kw = {"huffman": True}
        elif codec == "jbig2hufstd":
            sym_kw = {"huffman": True, "std_tables": True}
        elif codec == "jbig2hufalt":
            sym_kw = {"huffman": True, "std_tables": "alt"}
        elif codec == "jbig2hufsr":
            sym_kw = {"huffman": True, "refagg_dict": True,
                      "std_tables": True}
        bits = (arr <= 127).astype(np.uint8)  # dark pixels = black
        g, data = encode_jbig2_symbol_text(
            bits, split_globals=True, **sym_kw
        )
        parms = ""
        if g and builder is not None:
            # symbol dictionary rides in a /JBIG2Globals stream — the
            # organization real scanned-text PDFs use for shared dicts
            gnum = builder.add(
                f"<< /Length {len(g)} >>\nstream\n".encode()
                + g + b"\nendstream"
            )
            parms = f"/DecodeParms << /JBIG2Globals {gnum} 0 R >> "
        elif g:  # no builder to host the globals object: inline dict
            data = encode_jbig2_symbol_text(bits, **sym_kw)
        head = (
            f"<< /Type /XObject /Subtype /Image /Width {w} /Height {h} "
            f"/ColorSpace /DeviceGray /BitsPerComponent 1 "
            f"/Filter /JBIG2Decode {parms}"
            f"/Length {len(data)} >>\nstream\n"
        ).encode()
        return head + data + b"\nendstream"
    if codec == "ccitt" and arr.ndim == 2:
        from .ccitt import encode_g4

        data = encode_g4((arr <= 127).astype(np.uint8))  # dark pixels = black
        head = (
            f"<< /Type /XObject /Subtype /Image /Width {w} /Height {h} "
            f"/ColorSpace /DeviceGray /BitsPerComponent 1 /Filter /CCITTFaxDecode "
            f"/DecodeParms << /K -1 /Columns {w} /Rows {h} >> "
            f"/Length {len(data)} >>\nstream\n"
        ).encode()
        return head + data + b"\nendstream"
    if codec == "ccittg3" and arr.ndim == 2:
        # Group 3 mixed mode (K=2): the fax-era shape of older scan
        # archives — EOL tag bits alternate 1D anchor rows with 2D rows
        from .ccitt import encode_g3

        data = encode_g3((arr <= 127).astype(np.uint8), k=2)
        head = (
            f"<< /Type /XObject /Subtype /Image /Width {w} /Height {h} "
            f"/ColorSpace /DeviceGray /BitsPerComponent 1 /Filter /CCITTFaxDecode "
            f"/DecodeParms << /K 2 /Columns {w} /Rows {h} >> "
            f"/Length {len(data)} >>\nstream\n"
        ).encode()
        return head + data + b"\nendstream"
    if codec in ("jbig2", "jbig2m", "jbig2r") and arr.ndim == 2:
        from .jbig2 import encode_jbig2_embedded

        bits = (arr <= 127).astype(np.uint8)  # dark pixels = black
        if codec == "jbig2m":
            # MMR-coded generic region (T.88 §6.2.6 -> T.6)
            data = encode_jbig2_embedded(bits, mmr=True)
        elif codec == "jbig2r":
            # lossy base + refine-to-lossless (§6.3, TPGRON on)
            data = encode_jbig2_embedded(
                bits, refine=True, gr_template=1, tpgron=True
            )
        else:
            data = encode_jbig2_embedded(bits, tpgdon=True)
        head = (
            f"<< /Type /XObject /Subtype /Image /Width {w} /Height {h} "
            f"/ColorSpace /DeviceGray /BitsPerComponent 1 /Filter /JBIG2Decode "
            f"/Length {len(data)} >>\nstream\n"
        ).encode()
        return head + data + b"\nendstream"
    if codec == "jbig2h" and arr.ndim == 2:
        # halftoned scan: 4x4-block darkness grid -> pattern-stamped
        # page (§6.6/§6.7). Lossy like jpx97; pads to a 4-multiple.
        from .jbig2 import encode_jbig2_halftone

        bits = (arr <= 127).astype(np.uint8)
        ph = (-h) % 4
        pw = (-w) % 4
        if ph or pw:
            bits = np.pad(bits, ((0, ph), (0, pw)))
        gray = bits.reshape(bits.shape[0] // 4, 4, bits.shape[1] // 4, 4)
        gray = gray.sum(axis=(1, 3))  # 0..16 darkness levels
        data = encode_jbig2_halftone(gray)
        hh, ww = bits.shape
        head = (
            f"<< /Type /XObject /Subtype /Image /Width {ww} /Height {hh} "
            f"/ColorSpace /DeviceGray /BitsPerComponent 1 /Filter /JBIG2Decode "
            f"/Length {len(data)} >>\nstream\n"
        ).encode()
        return head + data + b"\nendstream"
    if codec in ("jpx", "jpx97", "jpxq", "jpxbyp", "jpxcoc", "jpxtile"):
        from .jpx import encode_jpx

        if codec == "jpxtile":
            # per-tile rate allocation (the archival scanner shape:
            # a finer quantizer where the page content is): lossy 9/7
            # multi-tile with tile-part-header QCD overrides on the
            # odd tiles; rasters too small for a 2x2 grid degrade to
            # the plain lossy profile
            if min(h, w) > 64:
                ntx = -(-w // 64)
                nty = -(-h // 64)
                ovr = {
                    ti: {"qstep": 1.0 / 64}
                    for ti in range(1, ntx * nty, 2)
                }
                data = encode_jpx(
                    np.ascontiguousarray(arr, dtype=np.uint8), levels=2,
                    tile_size=64, irreversible=True, qstep=1.0 / 16,
                    tile_overrides=ovr or None,
                )
            else:
                data = encode_jpx(
                    np.ascontiguousarray(arr, dtype=np.uint8), levels=2,
                    irreversible=True, qstep=1.0 / 16,
                )
        elif codec == "jpxcoc":
            # per-component COC override profile (T.800 A.6.2): the
            # COD signals a shallow default; COC segments re-specify
            # depth, code-block geometry and the bypass style per
            # component (RGB: the production luma-fine/chroma-coarse
            # split; grayscale: a full COC re-specification of the
            # single component). Lossless, so spans stay exact.
            if arr.ndim == 3:
                data = encode_jpx(
                    np.ascontiguousarray(arr, dtype=np.uint8), levels=3,
                    coc={1: {"levels": 2, "cb": 4},
                         2: {"levels": 2, "cb": 4, "style": 0x01}},
                )
            else:
                data = encode_jpx(
                    np.ascontiguousarray(arr, dtype=np.uint8), levels=2,
                    coc={0: {"levels": 3, "cb": 5, "style": 0x01}},
                )
        elif codec == "jpxbyp":
            # production speed/resilience profile (the Kakadu/
            # OpenJPEG default knobs for fast archival scans):
            # selective arithmetic bypass + vertically causal
            # contexts + predictable termination on the 9/7 path
            data = encode_jpx(
                np.ascontiguousarray(arr, dtype=np.uint8), levels=2,
                irreversible=True, qstep=1.0 / 16,
                cblk_style=0x01 | 0x08 | 0x10,
            )
        elif codec == "jpxq":
            # per-component quantization signalling (QCC): coarse
            # chroma for RGB; grayscale has one component, so the
            # fixture degrades to the plain expounded lossy shape
            if arr.ndim == 3:
                data = encode_jpx(
                    np.ascontiguousarray(arr, dtype=np.uint8), levels=2,
                    irreversible=True, qstep=1.0 / 32, chroma_qstep=1.0 / 8,
                )
            else:
                data = encode_jpx(
                    np.ascontiguousarray(arr, dtype=np.uint8), levels=2,
                    irreversible=True, qstep=1.0 / 32,
                )
        elif codec == "jpx97":
            # lossy archival-scan profile: 9/7 irreversible wavelet
            # with a derived-style QCD (the common OpenJPEG default),
            # exercising the quantized decode path end-to-end
            data = encode_jpx(
                np.ascontiguousarray(arr, dtype=np.uint8), levels=2,
                irreversible=True, qstep=1.0 / 16, qcd_style="derived",
            )
        else:
            # archival lossless masters: tile when the raster is big
            # enough (the production multi-tile shape — 64 here so
            # fixture pages get a real grid incl. partial edge tiles)
            data = encode_jpx(
                np.ascontiguousarray(arr, dtype=np.uint8), levels=2,
                tile_size=64 if min(h, w) > 64 else None,
            )
        head = (
            f"<< /Type /XObject /Subtype /Image /Width {w} /Height {h} "
            f"/ColorSpace /{cs} /BitsPerComponent 8 /Filter /JPXDecode "
            f"/Length {len(data)} >>\nstream\n"
        ).encode()
        return head + data + b"\nendstream"
    if codec == "jpeg":
        from .jpeg import encode_jpeg

        data = encode_jpeg(np.ascontiguousarray(arr, dtype=np.uint8), quality=75)
        filt = "DCTDecode"
    else:
        raw = np.ascontiguousarray(arr, dtype=np.uint8).tobytes()
        # Adaptive level (same probe as pdfio/png.py encode_png), with
        # deflate-1 as the compressible default: on the corpus's noise
        # rasters level 1 reaches 98% of level 6's ratio at ~3x the
        # speed (measured 4.5 ms vs 13.5 ms per 448 KB page, ratio
        # 1.68 vs 1.72), and zlib.compress dominated fixture
        # generation (~87% of document_from_text).
        lvl = 1
        if len(raw) >= 65536 and len(zlib.compress(raw[:16384], 1)) > 16384 - 1024:
            lvl = 0
        data = zlib.compress(raw, level=lvl)
        filt = "FlateDecode"
    head = (
        f"<< /Type /XObject /Subtype /Image /Width {w} /Height {h} "
        f"/ColorSpace /{cs} /BitsPerComponent 8 /Filter /{filt} "
        f"/Length {len(data)} >>\nstream\n"
    ).encode()
    return head + data + b"\nendstream"


def write_pdf(
    pages: list[PageSpec], *, pdf15: bool = False,
    encrypt: "bool | str" = False, user_password: str = "",
    cid_font: bool = False,
) -> bytes:
    """Serialize pages into a complete PDF byte stream.

    ``pdf15=True`` emits the PDF 1.5 container layout (object stream +
    cross-reference stream) with identical page content — the parser
    must extract byte-identical spans from either form.

    ``encrypt=True`` applies the standard security handler (RC4-40,
    R2, deterministic /ID) with ``user_password``; ``encrypt="aes"``
    emits V4/R4 crypt filters with /AESV2 (AES-128-CBC);
    ``encrypt="aes256"`` emits V5/R6 with /AESV3 (AES-256, the modern
    default); ``encrypt="pubkey"`` emits the certificate security
    handler (/Adobe.PubSec, /adbe.pkcs7.s5) with an AESV2 crypt filter
    and a CMS EnvelopedData /Recipients blob for the engine's fixture
    RSA key (pdfio/pubsec.py). All modes compose with both layouts
    (classic and 1.5).

    ``cid_font`` routes all text through a Type0 composite font so the
    ONLY way back to the original text is the font-decoding layer
    (pdfio/fonts.py). ``True`` (== "identity"): /Identity-H with a
    /ToUnicode CMap and per-document glyph codes — the shape every
    real-world subsetting producer emits. ``"embedded"``: /Encoding is
    an embedded CMap STREAM with a mixed 1-byte (ASCII) + 2-byte
    codespace and cidranges, exercising codespacerange-driven
    variable-width segmentation. ``"ucs2"``: /Encoding is the
    predefined /UniJIS-UCS2-H name with NO /ToUnicode — show strings
    carry raw UCS-2 code points (the CJK-PDF shape that used to emit
    mojibake under identity fallback).
    """

    b = _Builder()
    catalog_num = b.reserve()
    pages_num = b.reserve()
    cid_mode = (
        "" if not cid_font
        else ("identity" if cid_font is True else str(cid_font))
    )
    encode_show: "Callable[[str], bytes] | None" = None
    if cid_mode == "identity":
        chars = sorted(
            {c for page in pages for it in page.items if it[0] == "text" for c in it[1]}
        )
        code_of = {c: i + 1 for i, c in enumerate(chars)}  # 0 stays notdef
        cmap = _tounicode_cmap({i + 1: c for i, c in enumerate(chars)})
        tu_num = b.add(
            b"<< /Length %d >>\nstream\n" % len(cmap) + cmap + b"\nendstream"
        )
        desc_num = b.add(
            b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /SynthCID "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
            b"/Supplement 0 >> /CIDToGIDMap /Identity /DW 500 >>"
        )
        font_num = b.add(
            b"<< /Type /Font /Subtype /Type0 /BaseFont /SynthCID "
            b"/Encoding /Identity-H /DescendantFonts [%d 0 R] "
            b"/ToUnicode %d 0 R >>" % (desc_num, tu_num)
        )
        encode_show = lambda text: "".join(  # noqa: E731
            f"{code_of[c]:04x}" for c in text
        ).encode()
    elif cid_mode == "embedded":
        chars = sorted(
            {c for page in pages for it in page.items if it[0] == "text" for c in it[1]}
        )
        # ASCII rides 1-byte codes (its own value); everything else
        # gets 2-byte codes from 0x8000 up, so the two int keyspaces
        # never collide in the /ToUnicode map
        wide = [c for c in chars if ord(c) >= 0x80]
        code_of = {c: (ord(c) if ord(c) < 0x80 else 0x8000 + wide.index(c))
                   for c in chars}
        cmap = _tounicode_cmap(
            {code: c for c, code in code_of.items() if code >= 0x8000}
        )
        tu_num = b.add(
            b"<< /Length %d >>\nstream\n" % len(cmap) + cmap + b"\nendstream"
        )
        enc_body = (
            b"%!PS-Adobe-3.0 Resource-CMap\n"
            b"/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
            b"/CIDSystemInfo << /Registry (Synth) /Ordering (Mixed) "
            b"/Supplement 0 >> def\n"
            b"/CMapName /Synth-Mixed-H def\n/CMapType 1 def\n/WMode 0 def\n"
            b"2 begincodespacerange\n<00> <7f>\n<8000> <ffff>\n"
            b"endcodespacerange\n"
            b"2 begincidrange\n<00> <7f> 0\n"
            + (b"<8000> <%04x> 128\n" % (0x8000 + max(len(wide) - 1, 0)))
            + b"endcidrange\nendcmap\n"
            b"CMapName currentdict /CMap defineresource pop\nend\nend"
        )
        enc_num = b.add(
            b"<< /Type /CMap /CMapName /Synth-Mixed-H /CIDSystemInfo "
            b"<< /Registry (Synth) /Ordering (Mixed) /Supplement 0 >> "
            b"/Length %d >>\nstream\n" % len(enc_body)
            + enc_body + b"\nendstream"
        )
        desc_num = b.add(
            b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /SynthCID "
            b"/CIDSystemInfo << /Registry (Synth) /Ordering (Mixed) "
            b"/Supplement 0 >> /CIDToGIDMap /Identity /DW 500 >>"
        )
        font_num = b.add(
            b"<< /Type /Font /Subtype /Type0 /BaseFont /SynthCID "
            b"/Encoding %d 0 R /DescendantFonts [%d 0 R] "
            b"/ToUnicode %d 0 R >>" % (enc_num, desc_num, tu_num)
        )
        encode_show = lambda text: "".join(  # noqa: E731
            f"{code_of[c]:02x}" if code_of[c] < 0x80 else f"{code_of[c]:04x}"
            for c in text
        ).encode()
    elif cid_mode == "ucs2":
        font_num = b.add(
            b"<< /Type /Font /Subtype /Type0 /BaseFont /SynthCJK "
            b"/Encoding /UniJIS-UCS2-H /DescendantFonts [%d 0 R] >>"
            % b.add(
                b"<< /Type /Font /Subtype /CIDFontType0 /BaseFont /SynthCJK "
                b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Japan1) "
                b"/Supplement 7 >> /DW 1000 >>"
            )
        )
        def encode_show(text: str) -> bytes:
            # UCS-2 is strictly 2 bytes/code: a non-BMP char would emit
            # 5+ hex digits and silently desync the whole show string
            # (and UniJIS-UCS2 has no codepoint for it anyway)
            for c in text:
                if ord(c) > 0xFFFF:
                    raise UserError(
                        "write_pdf: cid_font mode 'ucs2' cannot encode "
                        f"non-BMP character U+{ord(c):06X}."
                    )
            return "".join(f"{ord(c):04x}" for c in text).encode()
    elif cid_mode:
        raise UserError(f"write_pdf: unknown cid_font mode {cid_mode!r}.")
    else:
        font_num = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    kid_nums: list[int] = []
    for page in pages:
        h, w = page.raster.shape[:2]
        xobjects: dict[str, int] = {
            "Im0": b.add(_image_xobject(page.raster, page.codec, b))
        }

        ops = [b"q", f"{w} 0 0 {h} 0 0 cm".encode(), b"/Im0 Do", b"Q"]
        img_idx = 1
        for item in page.items:
            kind = item[0]
            if kind == "text":
                _, text, row, col = item
                x, y = col, h - row  # PDF y-up
                if encode_show is not None:
                    show = b"<" + encode_show(text) + b"> Tj"
                else:
                    show = b"(" + _escape_pdf_string(text) + b") Tj"
                ops += [
                    b"BT",
                    b"/F1 12 Tf",
                    f"{x} {y} Td".encode(),
                    show,
                    b"ET",
                ]
            elif kind == "image":
                _, arr, row, col = item
                name = f"Im{img_idx}"
                img_idx += 1
                xobjects[name] = b.add(_image_xobject(arr, page.codec, b))
                ih, iw = arr.shape[:2]
                y_bottom = h - (row + ih)
                ops += [
                    b"q",
                    f"{iw} 0 0 {ih} {col} {y_bottom} cm".encode(),
                    f"/{name} Do".encode(),
                    b"Q",
                ]
            else:
                raise ValueError(f"Unknown page item kind: {kind!r}")

        content = zlib.compress(b"\n".join(ops), level=6)
        content_num = b.add(
            f"<< /Length {len(content)} /Filter /FlateDecode >>\nstream\n".encode()
            + content
            + b"\nendstream"
        )

        xo = " ".join(f"/{name} {num} 0 R" for name, num in xobjects.items())
        page_dict = (
            f"<< /Type /Page /Parent {pages_num} 0 R /MediaBox [0 0 {w} {h}] "
            f"/Rotate {page.rotate % 360} /Contents {content_num} 0 R "
            f"/Resources << /XObject << {xo} >> /Font << /F1 {font_num} 0 R >> >> >>"
        )
        kid_nums.append(b.add(page_dict.encode()))

    kids = " ".join(f"{n} 0 R" for n in kid_nums)
    b.set(pages_num, f"<< /Type /Pages /Kids [{kids}] /Count {len(kid_nums)} >>".encode())
    b.set(catalog_num, f"<< /Type /Catalog /Pages {pages_num} 0 R >>".encode())
    enc_info = None
    if encrypt:
        import hashlib

        from .crypt import compute_key, compute_o, compute_u

        pw = user_password.encode("latin-1")
        id0 = hashlib.md5(b"pdf_toolkit_spark deterministic file id").digest()
        if encrypt == "aes256":
            from .crypt import make_r6_entries

            key = hashlib.sha256(b"pdf_toolkit_spark aes256 file key").digest()
            ent = make_r6_entries(pw, pw if pw else b"owner", key, 0xFFFFFFFF)
            enc_num = b.add(
                (
                    "<< /Filter /Standard /V 5 /R 6 /Length 256 /P -1 "
                    "/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
                    "/StmF /StdCF /StrF /StdCF /EncryptMetadata true "
                    f"/O <{ent['O'].hex()}> /U <{ent['U'].hex()}> "
                    f"/OE <{ent['OE'].hex()}> /UE <{ent['UE'].hex()}> "
                    f"/Perms <{ent['Perms'].hex()}> >>"
                ).encode()
            )
            enc_info = (enc_num, id0, key, "256")
        elif encrypt == "pubkey":
            from .pubsec import (
                fixture_keypair,
                make_recipient_blob,
                pubsec_file_key,
            )

            n, e, _ = fixture_keypair()
            seed = hashlib.sha1(b"pdf_toolkit_spark pubsec seed").digest()
            blob = make_recipient_blob(
                n, e, seed, 0xFFFFFFFC, entropy=b"pdf_toolkit_spark pubsec cek"
            )
            key = pubsec_file_key(seed, [blob], 16)
            enc_num = b.add(
                (
                    "<< /Filter /Adobe.PubSec /SubFilter /adbe.pkcs7.s5 "
                    "/V 4 /Length 128 "
                    "/CF << /DefaultCryptFilter << /Type /CryptFilter "
                    "/CFM /AESV2 /Length 16 "
                    f"/Recipients [<{blob.hex()}>] >> >> "
                    "/StmF /DefaultCryptFilter /StrF /DefaultCryptFilter >>"
                ).encode()
            )
            enc_info = (enc_num, id0, key, True)
        elif encrypt == "aes":
            o_entry = compute_o(pw, pw, r=4, key_len=16)
            key = compute_key(pw, o_entry, 0xFFFFFFFF, id0, r=4, key_len=16)
            u_entry = compute_u(key, id0, r=4)
            enc_num = b.add(
                f"<< /Filter /Standard /V 4 /R 4 /Length 128 /P -1 "
                f"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
                f"/StmF /StdCF /StrF /StdCF "
                f"/O <{o_entry.hex()}> /U <{u_entry.hex()}> >>".encode()
            )
            enc_info = (enc_num, id0, key, True)
        else:
            o_entry = compute_o(pw, pw, r=2, key_len=5)
            key = compute_key(pw, o_entry, 0xFFFFFFFF, id0, r=2, key_len=5)
            u_entry = compute_u(key, id0, r=2)
            enc_info = None
            enc_num = b.add(
                f"<< /Filter /Standard /V 1 /R 2 /Length 40 /P -1 "
                f"/O <{o_entry.hex()}> /U <{u_entry.hex()}> >>".encode()
            )
            enc_info = (enc_num, id0, key)
    return b.render(catalog_num, pdf15=pdf15, encrypt=enc_info)
