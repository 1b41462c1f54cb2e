"""CCITT Group 4 (T.6) and Group 3 (T.4 1D + mixed 1D/2D) codecs:
round-trips, JDK-ImageIO cross-engine validation (T.6 both
directions; T.4 2D and RLE decode), and the /CCITTFaxDecode XObject
path across all three K regimes."""

from __future__ import annotations

import shutil
import struct
import subprocess

import numpy as np
import pytest

from pdf_toolkit_spark.errors import UserError
from pdf_toolkit_spark.pdfio.ccitt import (
    decode_ccitt_pdf,
    decode_g3,
    decode_g4,
    encode_g3,
    encode_g4,
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
    wide = np.zeros((6, 3000), np.uint8)
    wide[:, 100:2900] = 1
    wide[3, :] = 0
    wide[3, 2950:] = 1
    return {
        "structured": img,
        "noise": (RNG.random((30, 80)) > 0.5).astype(np.uint8),
        "white": np.zeros((10, 64), np.uint8),
        "black": np.ones((10, 64), np.uint8),
        "thin": thin,
        "wide": wide,  # makeup + extended-makeup run codes
    }


@pytest.mark.parametrize("name", sorted(_cases()))
def test_g4_roundtrip(name):
    img = _cases()[name]
    h, w = img.shape
    assert np.array_equal(decode_g4(encode_g4(img), w, h), img)


def test_g4_rejects_truncated_and_garbage():
    img = _cases()["structured"]
    enc = encode_g4(img)
    with pytest.raises(UserError):
        decode_g4(enc[: len(enc) // 3], img.shape[1], img.shape[0])
    with pytest.raises(UserError):
        decode_g4(b"\x00" * 16, 64, 4)  # all-zero bits: no valid codeword


@pytest.mark.parametrize("name", sorted(_cases()))
@pytest.mark.parametrize("mode", [
    (0, False, False), (0, True, False), (0, False, True),
    (1, False, False), (2, False, False), (4, True, False),
])
def test_g3_roundtrip(name, mode):
    """Group 3 (T.4) round-trips: pure 1D (with/without EOLs and byte
    alignment) and mixed 1D/2D at several K values."""

    k, ba, eol = mode
    img = _cases()[name]
    h, w = img.shape
    enc = encode_g3(img, k=k, end_of_line=eol, byte_align=ba)
    assert np.array_equal(decode_g3(enc, w, h, k=k, byte_align=ba), img)


def test_g3_k_positive_without_eol_fails_closed():
    img = _cases()["structured"]
    enc = encode_g3(img, k=0)  # no EOLs -> K>0 mode bit has nowhere to live
    with pytest.raises(UserError, match="EOL"):
        decode_g3(enc, img.shape[1], img.shape[0], k=2)


def test_g3_pdf_dispatch():
    """decode_ccitt_pdf routes K=0 to 1D and K>0 to mixed mode and
    still honours /BlackIs1."""

    img = _cases()["structured"]
    h, w = img.shape
    for k, data in [(0, encode_g3(img, k=0)), (2, encode_g3(img, k=2))]:
        parms = {"K": k, "Columns": w, "Rows": h}
        out = decode_ccitt_pdf(data, parms)
        assert np.array_equal(out, np.where(img == 1, 0, 255).astype(np.uint8))
        inv = decode_ccitt_pdf(data, dict(parms, BlackIs1=True))
        assert np.array_equal(inv, 255 - out)


# ---------------------------------------------------------------------------
# Cross-engine: JDK ImageIO TIFF "CCITT T.6" (independent implementation)
# ---------------------------------------------------------------------------

_JAVA = shutil.which("java") is not None and shutil.which("javac") is not None

_TIFF_TOOL = r"""
import java.awt.image.BufferedImage;
import java.io.*;
import java.nio.file.*;
import javax.imageio.*;
import javax.imageio.stream.*;
public class TiffTool {
    public static void main(String[] a) throws Exception {
        if (a[0].equals("encode")) {
            byte[] raw = Files.readAllBytes(Paths.get(a[1]));
            int w = Integer.parseInt(a[2]), h = Integer.parseInt(a[3]);
            BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_BINARY);
            int i = 0;
            for (int y = 0; y < h; y++) for (int x = 0; x < w; x++)
                img.getRaster().setSample(x, y, 0, (raw[i++] & 0xFF) > 127 ? 1 : 0);
            ImageWriter wr = ImageIO.getImageWritersByFormatName("tiff").next();
            ImageWriteParam p = wr.getDefaultWriteParam();
            p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
            p.setCompressionType(a.length > 5 ? a[5] : "CCITT T.6");
            try (ImageOutputStream os = ImageIO.createImageOutputStream(new File(a[4]))) {
                wr.setOutput(os);
                wr.write(null, new IIOImage(img, null, null), p);
            }
        } else {
            BufferedImage img = ImageIO.read(new File(a[1]));
            int w = img.getWidth(), h = img.getHeight();
            byte[] out = new byte[w * h];
            int i = 0;
            for (int y = 0; y < h; y++) for (int x = 0; x < w; x++)
                out[i++] = (byte)(img.getRaster().getSample(x, y, 0) != 0 ? 255 : 0);
            Files.write(Paths.get(a[2]), out);
        }
    }
}
"""


@pytest.fixture(scope="module")
def tiff_tool(tmp_path_factory):
    if not _JAVA:
        pytest.skip("no JDK in environment")
    d = tmp_path_factory.mktemp("tifftool")
    (d / "TiffTool.java").write_text(_TIFF_TOOL)
    subprocess.run(["javac", str(d / "TiffTool.java")], check=True, cwd=d)
    return str(d)


def _tiff_g4_strip(path: str):
    d = open(path, "rb").read()
    be = d[:2] == b"MM"
    bo = ">" if be else "<"
    off = struct.unpack(bo + "I", d[4:8])[0]
    n = struct.unpack(bo + "H", d[off:off + 2])[0]
    tags = {}
    for i in range(n):
        t, typ, _cnt = struct.unpack(bo + "HHI", d[off + 2 + 12 * i:off + 10 + 12 * i])
        raw = d[off + 10 + 12 * i:off + 14 + 12 * i]
        tags[t] = struct.unpack(bo + ("H" if typ == 3 else "I"), raw[: 2 if typ == 3 else 4])[0]
    assert tags[259] == 4
    return d[tags[273]:tags[273] + tags[279]], tags[256], tags[257]


def test_imageio_t6_streams_decode_exactly(tiff_tool, tmp_path):
    for name, img in _cases().items():
        h, w = img.shape
        raw = ((1 - img) * 255).astype(np.uint8)  # 255 = white for the tool
        (tmp_path / "x.raw").write_bytes(raw.tobytes())
        subprocess.run(
            ["java", "-cp", tiff_tool, "TiffTool", "encode",
             str(tmp_path / "x.raw"), str(w), str(h), str(tmp_path / "x.tif")],
            check=True)
        strip, tw, th = _tiff_g4_strip(str(tmp_path / "x.tif"))
        assert np.array_equal(decode_g4(strip, tw, th), img), name


def test_imageio_decodes_our_t6_streams(tiff_tool, tmp_path):
    def wrap_tiff(strip: bytes, w: int, h: int) -> bytes:
        hdr = b"II*\x00" + struct.pack("<I", 8)
        def tag(t, typ, cnt, val):
            return struct.pack("<HHII", t, typ, cnt, val)
        data_off = 8 + 2 + 9 * 12 + 4
        ifd = struct.pack("<H", 9)
        ifd += tag(256, 4, 1, w) + tag(257, 4, 1, h) + tag(258, 3, 1, 1)
        ifd += tag(259, 3, 1, 4) + tag(262, 3, 1, 0) + tag(273, 4, 1, data_off)
        ifd += tag(277, 3, 1, 1) + tag(278, 4, 1, h) + tag(279, 4, 1, len(strip))
        ifd += struct.pack("<I", 0)
        return hdr + ifd + strip

    img = _cases()["structured"]
    h, w = img.shape
    (tmp_path / "o.tif").write_bytes(wrap_tiff(encode_g4(img), w, h))
    subprocess.run(
        ["java", "-cp", tiff_tool, "TiffTool", "decode",
         str(tmp_path / "o.tif"), str(tmp_path / "o.raw")], check=True)
    ref = np.frombuffer((tmp_path / "o.raw").read_bytes(), np.uint8).reshape(h, w)
    assert np.array_equal((ref == 0).astype(np.uint8), img) or np.array_equal(
        (ref != 0).astype(np.uint8), img)


# ---------------------------------------------------------------------------
# /CCITTFaxDecode image XObjects through the parser
# ---------------------------------------------------------------------------

def _ccitt_pdf(img: np.ndarray, extra_dict: bytes = b"") -> bytes:
    h, w = img.shape
    data = encode_g4(img)
    chunks = [
        b"%PDF-1.4\n",
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n",
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 60 40] "
        b"/Contents 4 0 R /Resources << /XObject << /Im0 5 0 R >> >> >>\nendobj\n",
        b"4 0 obj\n<< /Length 29 >>\nstream\nq %d 0 0 %d 5 5 cm /Im0 Do Q\nendstream\nendobj\n"
        % (w, h),
        b"5 0 obj\n<< /Type /XObject /Subtype /Image /Width %d /Height %d "
        b"/ColorSpace /DeviceGray /BitsPerComponent 1 /Filter /CCITTFaxDecode "
        b"/DecodeParms << /K -1 /Columns %d /Rows %d >> %s/Length %d >>\nstream\n"
        % (w, h, w, h, extra_dict, len(data)) + data + b"\nendstream\nendobj\n",
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


def test_ccitt_xobject_decodes_to_gray():
    img = np.zeros((20, 30), np.uint8)
    img[4:9, 5:20] = 1
    img[15, ::2] = 1
    page = PdfDocument(_ccitt_pdf(img)).load_page(0)
    items = [it for it in page.items if it[0] == "image"]
    assert len(items) == 1
    assert np.array_equal(items[0][1], np.where(img == 1, 0, 255).astype(np.uint8))


def test_ccitt_xobject_honors_decode_inversion():
    img = np.zeros((20, 30), np.uint8)
    img[2:6, 2:12] = 1
    page = PdfDocument(_ccitt_pdf(img, extra_dict=b"/Decode [1 0] ")).load_page(0)
    items = [it for it in page.items if it[0] == "image"]
    assert len(items) == 1
    assert np.array_equal(items[0][1], np.where(img == 1, 255, 0).astype(np.uint8))


def test_blackis1_inverts_gray_mapping():
    """/BlackIs1 true means black runs are 1 bits, which 1-bit
    DeviceGray renders as WHITE — the gray raster must invert."""

    img = _cases()["structured"]
    h, w = img.shape
    parms = {"K": -1, "Columns": w, "Rows": h}
    base = decode_ccitt_pdf(encode_g4(img), parms)
    inv = decode_ccitt_pdf(encode_g4(img), dict(parms, BlackIs1=True))
    assert np.array_equal(inv, 255 - base)


def test_columns_defaults_to_1728_per_spec():
    img = np.zeros((4, 1728), np.uint8)
    img[:, 100:900] = 1
    out = decode_ccitt_pdf(encode_g4(img), {"K": -1, "Rows": 4})
    assert out.shape == (4, 1728)
    assert np.array_equal(out, np.where(img == 1, 0, 255).astype(np.uint8))


# ---------------------------------------------------------------------------
# Cross-engine: JDK ImageIO TIFF "CCITT T.4" / "CCITT RLE" (Group 3)
# ---------------------------------------------------------------------------

def _tiff_strip(path: str):
    d = open(path, "rb").read()
    bo = ">" if d[:2] == b"MM" else "<"
    off = struct.unpack(bo + "I", d[4:8])[0]
    n = struct.unpack(bo + "H", d[off:off + 2])[0]
    tags = {}
    for i in range(n):
        t, typ, _cnt = struct.unpack(bo + "HHI", d[off + 2 + 12 * i:off + 10 + 12 * i])
        raw = d[off + 10 + 12 * i:off + 14 + 12 * i]
        tags[t] = struct.unpack(bo + ("H" if typ == 3 else "I"), raw[: 2 if typ == 3 else 4])[0]
    return (d[tags[273]:tags[273] + tags[279]], tags[256], tags[257],
            tags[259], tags.get(292, 0))


def _jdk_encode(tiff_tool, tmp_path, img, ctype):
    h, w = img.shape
    raw = ((1 - img) * 255).astype(np.uint8)  # 255 = white for the tool
    (tmp_path / "g3.raw").write_bytes(raw.tobytes())
    subprocess.run(
        ["java", "-cp", tiff_tool, "TiffTool", "encode",
         str(tmp_path / "g3.raw"), str(w), str(h), str(tmp_path / "g3.tif"),
         ctype],
        check=True)
    return _tiff_strip(str(tmp_path / "g3.tif"))


def test_imageio_t4_2d_streams_decode_exactly(tiff_tool, tmp_path):
    """JDK 'CCITT T.4' strips (compression 3, T4Options bit0 = 2D with
    EOL tag bits) decode exactly through the mixed-mode G3 path."""

    for name, img in _cases().items():
        strip, tw, th, comp, opts = _jdk_encode(
            tiff_tool, tmp_path, img, "CCITT T.4"
        )
        assert comp == 3 and opts & 1  # 2D mode
        assert np.array_equal(decode_g3(strip, tw, th, k=4), img), name


def test_imageio_rle_streams_decode_exactly(tiff_tool, tmp_path):
    """JDK 'CCITT RLE' strips (compression 2: G3 1D, each row
    byte-aligned, no EOLs) decode exactly through the 1D path."""

    for name, img in _cases().items():
        strip, tw, th, comp, _opts = _jdk_encode(
            tiff_tool, tmp_path, img, "CCITT RLE"
        )
        assert comp == 2
        assert np.array_equal(
            decode_g3(strip, tw, th, k=0, byte_align=True), img
        ), name


# ---------------------------------------------------------------------------
# Group 3 /CCITTFaxDecode XObjects through the parser + writer
# ---------------------------------------------------------------------------

def test_ccittg3_xobject_through_writer_and_parser():
    """The writer's ccittg3 codec (K=2 mixed mode) round-trips the
    raster bit-exactly through the full parser path."""

    from pdf_toolkit_spark.pdfio.writer import PageSpec, write_pdf

    raster = np.full((60, 100), 235, np.uint8)
    raster[10:16, 8:80] = 20
    raster[30:50:4, 15:95] = 35
    pdf_bytes = write_pdf([PageSpec(raster=raster, codec="ccittg3")])
    assert b"/K 2" in pdf_bytes
    page = PdfDocument(pdf_bytes).load_page(0)
    assert page.scan is not None
    expected = np.where(raster <= 127, 0, 255).astype(np.uint8)
    assert np.array_equal(page.scan, expected)
