"""PNG codec: full-baseline decode coverage (color types 0/2/3/4/6,
bit depths 1/2/4/8/16, PLTE, Adam7 interlace), hand-built fixtures
plus JDK-ImageIO cross-engine validation, and fail-closed rejection
of malformed files. The encoder stays 8-bit gray/RGB (the media-sink
contract); the decoder is the wide side because image-folder jobs
ingest foreign files."""

from __future__ import annotations

import shutil
import struct
import subprocess
import zlib

import numpy as np
import pytest

from pdf_toolkit_spark.pdfio.png import _ADAM7, _SIG, decode_png, encode_png

RNG = np.random.default_rng(11)


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload)) + tag + payload
        + struct.pack(">I", zlib.crc32(tag + payload))
    )


def _png(w, h, depth, color, raw, plte=None, interlace=0) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    out = _SIG + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte.tobytes())
    return out + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


def _rows(arr2d_bytes_per_row) -> bytes:
    return b"".join(b"\x00" + r for r in arr2d_bytes_per_row)


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_subbyte_gray_scales_to_full_range(depth):
    w, h = 19, 7
    mx = (1 << depth) - 1
    vals = RNG.integers(0, mx + 1, (h, w), dtype=np.uint8)
    rows = []
    for y in range(h):
        bits = np.zeros((w, depth), np.uint8)
        for b in range(depth):
            bits[:, b] = (vals[y] >> (depth - 1 - b)) & 1
        rows.append(np.packbits(bits.reshape(-1)).tobytes())
    dec = decode_png(_png(w, h, depth, 0, _rows(rows)))
    assert np.array_equal(dec, (vals.astype(np.uint16) * 255 // mx).astype(np.uint8))


def test_palette_4bit_lookup():
    pal = RNG.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = RNG.integers(0, 16, (5, 9), dtype=np.uint8)
    rows = []
    for y in range(5):
        b4 = np.zeros(10, np.uint8)
        b4[:9] = idx[y]
        rows.append(((b4[0::2] << 4) | b4[1::2]).tobytes())
    dec = decode_png(_png(9, 5, 4, 3, _rows(rows), plte=pal))
    assert np.array_equal(dec, pal[idx])


def test_gray16_takes_high_byte():
    g16 = RNG.integers(0, 65536, (6, 11), dtype=np.uint16)
    raw = _rows([g16[y].astype(">u2").tobytes() for y in range(6)])
    assert np.array_equal(decode_png(_png(11, 6, 16, 0, raw)), (g16 >> 8).astype(np.uint8))


def test_alpha_channels_dropped():
    rgba = RNG.integers(0, 256, (8, 13, 4), dtype=np.uint8)
    raw = _rows([rgba[y].tobytes() for y in range(8)])
    assert np.array_equal(decode_png(_png(13, 8, 8, 6, raw)), rgba[:, :, :3])
    ga = RNG.integers(0, 256, (4, 6, 2), dtype=np.uint8)
    raw = _rows([ga[y].tobytes() for y in range(4)])
    assert np.array_equal(decode_png(_png(6, 4, 8, 4, raw)), ga[:, :, 0])


@pytest.mark.parametrize("shape", [(10, 10), (8, 8), (3, 5), (1, 1), (17, 9)])
def test_adam7_interlace_gray(shape):
    h, w = shape
    img = RNG.integers(0, 256, (h, w), dtype=np.uint8)
    raw = b""
    for x0, y0, xs, ys in _ADAM7:
        sub = img[y0::ys, x0::xs]
        if sub.size == 0:
            continue
        raw += _rows([sub[y].tobytes() for y in range(sub.shape[0])])
    assert np.array_equal(decode_png(_png(w, h, 8, 0, raw, interlace=1)), img)


def test_rejections_fail_closed():
    with pytest.raises(ValueError):
        decode_png(b"not a png")
    pal = RNG.integers(0, 256, (2, 3), dtype=np.uint8)
    idx = np.full((2, 2), 5, np.uint8)  # index beyond the 2-entry palette
    raw = _rows([idx[y].tobytes() for y in range(2)])
    with pytest.raises(ValueError, match="palette index"):
        decode_png(_png(2, 2, 8, 3, raw, plte=pal))
    with pytest.raises(ValueError):  # palette PNG without PLTE
        decode_png(_png(2, 2, 8, 3, raw))
    with pytest.raises(ValueError):  # 16-bit palette is invalid
        decode_png(_png(2, 2, 16, 3, raw, plte=pal))
    with pytest.raises(ValueError):  # truncated scanlines
        decode_png(_png(4, 4, 8, 0, b"\x00\x00"))


def test_encoder_roundtrip_regression():
    g = RNG.integers(0, 256, (20, 30), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(g)), g)
    rgb = RNG.integers(0, 256, (12, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(rgb)), rgb)


# ---------------------------------------------------------------------------
# Cross-engine: JDK ImageIO PNG writer (independent encoder)
# ---------------------------------------------------------------------------

_JAVA = shutil.which("java") is not None and shutil.which("javac") is not None

_PNG_TOOL = r"""
import java.awt.image.*;
import java.io.*;
import java.nio.file.*;
import javax.imageio.*;
import javax.imageio.stream.*;
public class PngTool {
    public static void main(String[] a) throws Exception {
        byte[] raw = Files.readAllBytes(Paths.get(a[0]));
        int w = Integer.parseInt(a[1]), h = Integer.parseInt(a[2]);
        String mode = a[3];
        boolean progressive = a.length > 5 && a[5].equals("interlace");
        BufferedImage img;
        int i = 0;
        if (mode.equals("rgba")) {
            img = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB);
            for (int y = 0; y < h; y++) for (int x = 0; x < w; x++) {
                int r = raw[i++] & 0xFF, g = raw[i++] & 0xFF, b = raw[i++] & 0xFF, al = raw[i++] & 0xFF;
                img.setRGB(x, y, (al << 24) | (r << 16) | (g << 8) | b);
            }
        } else if (mode.equals("palette")) {
            byte[] rs = new byte[16], gs = new byte[16], bs = new byte[16];
            for (int p = 0; p < 16; p++) { rs[p] = raw[i++]; gs[p] = raw[i++]; bs[p] = raw[i++]; }
            IndexColorModel cm = new IndexColorModel(4, 16, rs, gs, bs);
            img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_BINARY, cm);
            for (int y = 0; y < h; y++) for (int x = 0; x < w; x++)
                img.getRaster().setSample(x, y, 0, raw[i++] & 0xFF);
        } else if (mode.equals("gray16")) {
            img = new BufferedImage(w, h, BufferedImage.TYPE_USHORT_GRAY);
            for (int y = 0; y < h; y++) for (int x = 0; x < w; x++) {
                int v = ((raw[i++] & 0xFF) << 8) | (raw[i++] & 0xFF);
                img.getRaster().setSample(x, y, 0, v);
            }
        } else {
            img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY);
            for (int y = 0; y < h; y++) for (int x = 0; x < w; x++)
                img.getRaster().setSample(x, y, 0, raw[i++] & 0xFF);
        }
        ImageWriter wr = ImageIO.getImageWritersByFormatName("png").next();
        ImageWriteParam p = wr.getDefaultWriteParam();
        if (progressive && p.canWriteProgressive()) p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT);
        try (ImageOutputStream os = ImageIO.createImageOutputStream(new File(a[4]))) {
            wr.setOutput(os);
            wr.write(null, new IIOImage(img, null, null), p);
        }
    }
}
"""


@pytest.fixture(scope="module")
def png_tool(tmp_path_factory):
    if not _JAVA:
        pytest.skip("no JDK in environment")
    d = tmp_path_factory.mktemp("pngtool")
    (d / "PngTool.java").write_text(_PNG_TOOL)
    subprocess.run(["javac", str(d / "PngTool.java")], check=True, cwd=d)
    return str(d)


def _jdk_png(png_tool, tmp_path, raw, w, h, mode, interlace=False):
    (tmp_path / "p.raw").write_bytes(raw)
    cmd = ["java", "-cp", png_tool, "PngTool", str(tmp_path / "p.raw"),
           str(w), str(h), mode, str(tmp_path / "p.png")]
    if interlace:
        cmd.append("interlace")
    subprocess.run(cmd, check=True)
    return (tmp_path / "p.png").read_bytes()


def test_jdk_png_variants_decode_exactly(png_tool, tmp_path):
    w, h = 23, 17
    rgba = RNG.integers(0, 256, (h, w, 4), dtype=np.uint8)
    assert np.array_equal(
        decode_png(_jdk_png(png_tool, tmp_path, rgba.tobytes(), w, h, "rgba")),
        rgba[:, :, :3],
    )
    pal = RNG.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = RNG.integers(0, 16, (h, w), dtype=np.uint8)
    assert np.array_equal(
        decode_png(_jdk_png(png_tool, tmp_path, pal.tobytes() + idx.tobytes(),
                            w, h, "palette")),
        pal[idx],
    )
    g16 = RNG.integers(0, 65536, (h, w), dtype=np.uint16)
    assert np.array_equal(
        decode_png(_jdk_png(png_tool, tmp_path, g16.astype(">u2").tobytes(),
                            w, h, "gray16")),
        (g16 >> 8).astype(np.uint8),
    )
    g8 = RNG.integers(0, 256, (h, w), dtype=np.uint8)
    data = _jdk_png(png_tool, tmp_path, g8.tobytes(), w, h, "gray8", interlace=True)
    ihdr_at = data.find(b"IHDR")
    assert data[ihdr_at + 16] == 1  # really interlaced
    assert np.array_equal(decode_png(data), g8)


def test_zero_dimension_png_is_rejected_before_inflate():
    """A zero width or height must fail closed BEFORE the IDAT
    inflate: the size product AND the inflate bound both compute to 0,
    and zlib treats max_length=0 as unlimited — a crafted zero-height
    header in front of a deflate bomb would otherwise balloon executor
    memory."""

    import struct
    import zlib

    import pytest

    from pdf_toolkit_spark.pdfio.png import decode_png

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    bomb = zlib.compress(b"\x00" * (1 << 20))
    for w, h in ((0, 8), (8, 0)):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        png = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", bomb)
            + chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="implausible"):
            decode_png(png)
