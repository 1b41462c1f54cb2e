"""JBIG2 (T.88) generic-region codec: MQ-coder stress round-trips,
generic region round-trips (with and without TPGDON), embedded segment
streams, the /JBIG2Decode XObject path, and graceful rejection of the
unsupported symbol-coding subset."""

from __future__ import annotations

import numpy as np
import pytest

from pdf_toolkit_spark.errors import UserError
from pdf_toolkit_spark.pdfio.jbig2 import (
    MQDecoder,
    MQEncoder,
    decode_generic,
    decode_jbig2_embedded,
    decode_jbig2_pdf,
    encode_generic,
    encode_jbig2_embedded,
)
from pdf_toolkit_spark.pdfio.parser import PdfDocument

RNG = np.random.default_rng(7)


def _cases() -> dict[str, np.ndarray]:
    img = np.zeros((60, 100), np.uint8)
    img[5:10, 3:40] = 1
    img[20:22, ::3] = 1
    img[40:55, 60:90] = 1
    img[50, :] = 1
    thin = np.zeros((8, 1), np.uint8)
    thin[::2, 0] = 1
    return {
        "structured": img,
        "noise": (RNG.random((30, 80)) > 0.5).astype(np.uint8),
        "white": np.zeros((10, 64), np.uint8),
        "black": np.ones((10, 64), np.uint8),
        "thin": thin,
        "repeated_rows": np.tile(
            (RNG.random((1, 120)) > 0.7).astype(np.uint8), (40, 1)
        ),  # TPGDON's best case
    }


def test_mq_coder_stress_roundtrip():
    rng = np.random.default_rng(11)
    for trial in range(10):
        n = int(rng.integers(1, 4000))
        bits = rng.integers(0, 2, n).tolist()
        ctxs = rng.integers(0, 1 << 16, n).tolist()
        enc = MQEncoder()
        for b, c in zip(bits, ctxs):
            enc.encode(int(b), int(c))
        dec = MQDecoder(enc.flush())
        assert [dec.decode(int(c)) for c in ctxs] == bits, trial


@pytest.mark.parametrize("name", sorted(_cases()))
@pytest.mark.parametrize("tpgdon", [False, True])
def test_generic_region_roundtrip(name, tpgdon):
    img = _cases()[name]
    h, w = img.shape
    data = encode_generic(img, tpgdon=tpgdon)
    assert np.array_equal(decode_generic(data, w, h, tpgdon=tpgdon), img)


def test_tpgdon_compresses_repeated_rows():
    img = _cases()["repeated_rows"]
    assert len(encode_generic(img, tpgdon=True)) < len(encode_generic(img))


@pytest.mark.parametrize("name", sorted(_cases()))
def test_embedded_stream_roundtrip(name):
    img = _cases()[name]
    assert np.array_equal(
        decode_jbig2_embedded(encode_jbig2_embedded(img, tpgdon=True)), img
    )


def test_decode_pdf_gray_mapping_and_globals_rejection():
    img = _cases()["structured"]
    gray = decode_jbig2_pdf(encode_jbig2_embedded(img), {})
    assert np.array_equal(gray, np.where(img == 1, 0, 255).astype(np.uint8))
    with pytest.raises(UserError, match="JBIG2Globals"):
        decode_jbig2_pdf(b"", {"JBIG2Globals": object()})


def test_symbol_segments_rejected_not_mangled():
    import struct

    # a symbol-dictionary segment (type 0) header with empty payload
    seg = struct.pack(">IB", 0, 0) + b"\x00" + b"\x01" + struct.pack(">I", 0)
    with pytest.raises(UserError, match="unsupported"):
        decode_jbig2_embedded(seg)


# ---------------------------------------------------------------------------
# /JBIG2Decode image XObjects through the parser
# ---------------------------------------------------------------------------

def _jbig2_pdf(img: np.ndarray, extra_dict: bytes = b"") -> bytes:
    h, w = img.shape
    data = encode_jbig2_embedded(img, tpgdon=True)
    chunks = [
        b"%PDF-1.4\n",
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n",
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 60 40] "
        b"/Contents 4 0 R /Resources << /XObject << /Im0 5 0 R >> >> >>\nendobj\n",
        b"4 0 obj\n<< /Length 29 >>\nstream\nq %d 0 0 %d 5 5 cm /Im0 Do Q\nendstream\nendobj\n"
        % (w, h),
        b"5 0 obj\n<< /Type /XObject /Subtype /Image /Width %d /Height %d "
        b"/ColorSpace /DeviceGray /BitsPerComponent 1 /Filter /JBIG2Decode "
        b"%s/Length %d >>\nstream\n" % (w, h, extra_dict, len(data))
        + data + b"\nendstream\nendobj\n",
    ]
    pdf = bytearray()
    offs = {}
    for i, c in enumerate(chunks):
        if i:
            offs[i] = len(pdf)
        pdf += c
    xref_at = len(pdf)
    pdf += b"xref\n0 6\n0000000000 65535 f \n"
    for i in range(1, 6):
        pdf += b"%010d 00000 n \n" % offs[i]
    pdf += b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % xref_at
    return bytes(pdf)


def test_jbig2_xobject_decodes_to_gray():
    img = np.zeros((20, 30), np.uint8)
    img[4:9, 5:20] = 1
    img[15, ::2] = 1
    page = PdfDocument(_jbig2_pdf(img)).load_page(0)
    items = [it for it in page.items if it[0] == "image"]
    assert len(items) == 1
    assert np.array_equal(items[0][1], np.where(img == 1, 0, 255).astype(np.uint8))


def test_jbig2_xobject_honors_decode_inversion():
    img = np.zeros((20, 30), np.uint8)
    img[2:6, 2:12] = 1
    page = PdfDocument(_jbig2_pdf(img, extra_dict=b"/Decode [1 0] ")).load_page(0)
    items = [it for it in page.items if it[0] == "image"]
    assert len(items) == 1
    assert np.array_equal(items[0][1], np.where(img == 1, 255, 0).astype(np.uint8))


def test_jbig2_corpus_doc_extracts_like_serial():
    """A jbig2-codec corpus doc runs the whole serial pipeline and its
    1-bit binarization matches the writer's threshold."""

    from pdf_toolkit_spark.corpus import make_document
    from pdf_toolkit_spark.extract import extract_document

    doc = make_document(8, seed=42, mega_every=0, jpeg_every=4)  # k=2 -> jbig2
    assert b"JBIG2Decode" in doc["pdf_bytes"]
    spans = extract_document(doc["pdf_bytes"])["spans"]
    assert len(spans) > 0
