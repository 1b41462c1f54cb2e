"""PDF 1.5+ parser surface: cross-reference streams, object streams,
incremental updates with free-entry shadowing, nested /Pages attribute
inheritance, string escapes, and the stream filter pipeline."""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from pdf_toolkit_spark.corpus import corpus_config, make_document
from pdf_toolkit_spark.errors import UserError
from pdf_toolkit_spark.extract import extract_document
from pdf_toolkit_spark.pdfio import PageSpec, PdfDocument, write_pdf
from pdf_toolkit_spark.pdfio.parser import (
    Ref,
    _ascii85_decode,
    _ascii_hex_decode,
    _decode_stream_data,
    _lzw_decode,
    _runlength_decode,
    _unescape_pdf_string,
    _unpredict,
)


def _pages(n=2, seed=3):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        raster = rng.integers(100, 250, size=(60, 45)).astype(np.uint8)
        items = [("text", f"page {i} body", 20, 5),
                 ("image", np.full((8, 9), 77, dtype=np.uint8), 30, 10)]
        out.append(PageSpec(raster=raster, rotate=(0, 90)[i % 2], items=items))
    return out


# --- xref streams + object streams ---

def test_pdf15_container_roundtrip_matches_classic():
    pages = _pages()
    classic = write_pdf(pages)
    pdf15 = write_pdf(pages, pdf15=True)
    assert classic != pdf15 and pdf15.startswith(b"%PDF-1.5")
    a, b = PdfDocument(classic), PdfDocument(pdf15)
    assert a.page_count == b.page_count == 2
    for i in range(2):
        pa, pb = a.load_page(i), b.load_page(i)
        assert (pa.width, pa.height, pa.rotate) == (pb.width, pb.height, pb.rotate)
        assert np.array_equal(pa.scan, pb.scan)
        assert len(pa.items) == len(pb.items)
        for ia, ib in zip(pa.items, pb.items):
            assert ia[0] == ib[0] and ia[2:] == ib[2:]
            if ia[0] == "text":
                assert ia[1] == ib[1]
            else:
                assert np.array_equal(ia[1], ib[1])


def test_pdf15_full_extraction_equals_classic():
    pages = _pages(3, seed=9)
    cfg = corpus_config()
    spans_classic = extract_document(write_pdf(pages))["spans"]
    spans_15 = extract_document(write_pdf(pages, pdf15=True))["spans"]
    assert spans_15 == spans_classic and len(spans_15) > 0
    assert cfg  # corpus config imported for parity with other tests


def test_corpus_mixes_both_container_layouts():
    d0 = make_document(0, seed=42, mega_every=0)
    d1 = make_document(1, seed=42, mega_every=0)
    assert d0["pdf_bytes"].startswith(b"%PDF-1.4")
    assert d1["pdf_bytes"].startswith(b"%PDF-1.5")
    # both parse + extract
    for d in (d0, d1):
        assert len(extract_document(d["pdf_bytes"])["spans"]) > 0


# --- incremental updates / free entries ---

def _append_revision(base: bytes, entries: list[tuple[int, bytes | None]],
                     root_num: int, size: int) -> bytes:
    """Append an incremental-update revision: each (num, body) is
    rewritten (body=None frees the object)."""

    prev_xref = int(base.rsplit(b"startxref", 1)[1].split(b"%%EOF")[0].strip())
    out = bytearray(base)
    lines = []
    for num, body in entries:
        if body is None:
            lines.append((num, b"0000000000 65535 f \n"))
        else:
            off = len(out)
            out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
            lines.append((num, f"{off:010d} 00000 n \n".encode()))
    xref_at = len(out)
    out += b"xref\n"
    for num, line in lines:
        out += f"{num} 1\n".encode() + line
    out += (
        f"trailer\n<< /Size {size} /Root {root_num} 0 R /Prev {prev_xref} >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def test_incremental_update_newer_object_wins():
    base = write_pdf(_pages(1))
    # object 3 is the font in the writer's layout; replace it
    updated = _append_revision(base, [(3, b"<< /Marker 42 >>")], root_num=1, size=20)
    doc = PdfDocument(updated)
    assert doc.resolve(Ref(3, 0)) == {"Marker": 42}
    assert len(extract_document(updated)["spans"]) > 0  # pages unaffected


def test_incremental_update_free_entry_shadows_older_offset():
    base = write_pdf(_pages(1))
    doc_before = PdfDocument(base)
    assert isinstance(doc_before.resolve(Ref(3, 0)), dict)  # font exists
    freed = _append_revision(base, [(3, None)], root_num=1, size=20)
    doc = PdfDocument(freed)
    with pytest.raises(UserError, match="not in xref"):
        doc.resolve(Ref(3, 0))
    assert len(extract_document(freed)["spans"]) > 0  # font never consumed


# --- nested /Pages with attribute inheritance ---

def _classic_pdf(objects: dict[int, bytes]) -> bytes:
    """Assemble a classic-xref PDF from {num: body} (1-based, dense)."""

    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objects[num] + b"\nendobj\n"
    xref_at = len(out)
    n = max(objects) + 1
    out += f"xref\n0 {n}\n".encode() + b"0000000000 65535 f \n"
    for num in range(1, n):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += f"trailer\n<< /Size {n} /Root 1 0 R >>\nstartxref\n{xref_at}\n%%EOF\n".encode()
    return bytes(out)


def _nested_pages_fixture() -> bytes:
    w, h = 40, 30
    scan = bytes(range(256)) * ((w * h) // 256 + 1)
    scan = scan[: w * h]
    content = b"q 40 0 0 30 0 0 cm /Im0 Do Q BT 5 10 Td (hi \\101\\102\\103) Tj ET"
    return _classic_pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        # root Pages carries ALL inheritable attrs (§7.7.3.4)
        2: (b"<< /Type /Pages /Kids [3 0 R] /Count 2 /MediaBox [0 0 40 30] "
            b"/Rotate 90 /Resources << /XObject << /Im0 6 0 R >> >> >>"),
        3: b"<< /Type /Pages /Parent 2 0 R /Kids [4 0 R 5 0 R] /Count 2 >>",
        4: b"<< /Type /Page /Parent 3 0 R /Contents 7 0 R >>",
        5: b"<< /Type /Page /Parent 3 0 R /Rotate 0 /Contents 7 0 R >>",
        6: (b"<< /Type /XObject /Subtype /Image /Width 40 /Height 30 "
            b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Length "
            + str(len(scan)).encode() + b" >>\nstream\n" + scan + b"\nendstream"),
        7: (b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
            + content + b"\nendstream"),
    })


def test_nested_pages_inherit_mediabox_rotate_resources():
    doc = PdfDocument(_nested_pages_fixture())
    assert doc.page_count == 2
    p0 = doc.load_page(0)
    # MediaBox + Resources inherited from the root Pages node two levels up
    assert (p0.width, p0.height) == (40, 30)
    assert p0.rotate == 90                       # inherited
    assert p0.scan is not None and p0.scan.shape == (30, 40)
    assert p0.items[0][:2] == ("text", "hi ABC")  # octal escapes decoded
    p1 = doc.load_page(1)
    assert p1.rotate == 0                        # page's own value overrides


# --- string escapes ---

def test_octal_and_continuation_escapes():
    assert _unescape_pdf_string(rb"\101\102\103") == b"ABC"
    assert _unescape_pdf_string(rb"\053") == b"+"
    assert _unescape_pdf_string(rb"a\53b") == b"a+b"        # 1-2 digit forms
    assert _unescape_pdf_string(b"line\\\ncontinued") == b"linecontinued"
    assert _unescape_pdf_string(b"a\\\r\nb") == b"ab"       # CRLF continuation
    assert _unescape_pdf_string(rb"\n\t\(\)") == b"\n\t()"


def test_octal_escape_in_general_lexer_string():
    # hex string in the stream forces the general-lexer path
    content = b"BT 5 10 Td (\\101\\102 <deadbeef>) Tj ET"
    # route through a full document so both scanners are reachable
    doc = PdfDocument(_classic_pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 50 50] >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: (b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
            + content + b"\nendstream"),
    }))
    items = doc.load_page(0).items
    assert items and items[0][1].startswith("AB ")


# --- filter pipeline ---

def test_runlength_and_asciihex_and_ascii85():
    assert _runlength_decode(bytes([2]) + b"abc" + bytes([254]) + b"z" + bytes([128])) \
        == b"abc" + b"z" * 3
    assert _ascii_hex_decode(b"48 65 6C 6C 6F>") == b"Hello"
    import base64

    payload = bytes(range(251))
    assert _ascii85_decode(base64.a85encode(payload)) == payload


def _lzw_encode(data: bytes) -> bytes:
    """Minimal LZW encoder (early-change=1) for round-trip testing.
    Emits each code at the width the DECODER will read it with, by
    simulating the decoder's table growth (one entry per emitted data
    code after the first)."""

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    dec_len = 258  # decoder table size after the clear code
    fresh = True   # decoder appends nothing on the first code after clear
    out_bits: list[tuple[int, int]] = [(256, 9)]  # leading clear code

    def emit(code: int) -> None:
        nonlocal dec_len, width, fresh
        out_bits.append((code, width))
        if fresh:
            fresh = False
            return
        dec_len += 1  # decoder appends after every data code but the first
        if width < 12 and dec_len in (511, 1023, 2047):
            width += 1

    def clear() -> None:
        nonlocal table, next_code, width, dec_len, fresh
        out_bits.append((256, width))
        table = {bytes([i]): i for i in range(256)}
        next_code = 258
        width = 9
        dec_len = 258
        fresh = True

    cur = b""
    for byte in data:
        nxt = cur + bytes([byte])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        table[nxt] = next_code
        next_code += 1
        cur = bytes([byte])
        if next_code >= 4094:  # table (nearly) full: restart the dictionary
            emit(table[cur])
            clear()
            cur = b""
    if cur:
        emit(table[cur])
    out_bits.append((257, width))
    buf = bits = 0
    out = bytearray()
    for code, w in out_bits:
        buf = (buf << w) | code
        bits += w
        while bits >= 8:
            bits -= 8
            out.append((buf >> bits) & 0xFF)
    if bits:
        out.append((buf << (8 - bits)) & 0xFF)
    return bytes(out)


def test_lzw_roundtrip():
    rng = np.random.default_rng(5)
    for payload in (b"", b"AAAAAAAABBBBCCC" * 20,
                    bytes(rng.integers(0, 8, size=4000, dtype=np.uint8)),
                    # high-entropy + long: drives the table past 511/1023/
                    # 2047 so every code-width transition is exercised
                    bytes(rng.integers(0, 256, size=20000, dtype=np.uint8))):
        assert _lzw_decode(_lzw_encode(payload)) == payload


def test_flate_with_png_up_predictor():
    w = 7
    rows = np.arange(5 * w, dtype=np.uint8).reshape(5, w)
    filtered = bytearray()
    prior = np.zeros(w, dtype=np.int32)
    for y in range(5):
        filtered.append(2)  # Up
        filtered += ((rows[y].astype(np.int32) - prior) & 0xFF).astype(np.uint8).tobytes()
        prior = rows[y].astype(np.int32)
    obj = {"Filter": "FlateDecode",
           "DecodeParms": {"Predictor": 12, "Columns": w}}
    got = _decode_stream_data(obj, zlib.compress(bytes(filtered)), lambda v: v)
    assert got == rows.tobytes()


def test_filter_array_composes():
    payload = b"composed filters payload" * 4
    import base64

    encoded = base64.a85encode(zlib.compress(payload))
    obj = {"Filter": ["ASCII85Decode", "FlateDecode"]}
    assert _decode_stream_data(obj, bytes(encoded), lambda v: v) == payload


def test_unsupported_filter_raises_but_image_becomes_missing_scan():
    with pytest.raises(UserError, match="DCTDecode"):
        _decode_stream_data({"Filter": "DCTDecode"}, b"\xff\xd8", lambda v: v)
    # a DCT image inside a page -> missing raster, not a crash
    content = b"q 40 0 0 30 0 0 cm /Im0 Do Q BT 2 4 Td (ok) Tj ET"
    doc = PdfDocument(_classic_pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 40 30] >>",
        3: (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /XObject << /Im0 5 0 R >> >> >>"),
        4: (b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
            + content + b"\nendstream"),
        5: (b"<< /Type /XObject /Subtype /Image /Width 40 /Height 30 "
            b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /DCTDecode "
            b"/Length 2 >>\nstream\n\xff\xd8\nendstream"),
    }))
    page = doc.load_page(0)
    assert page.scan is None
    assert [it[0] for it in page.items] == ["text"]


def test_tiff_predictor_2():
    w = 6
    rows = np.arange(3 * w, dtype=np.uint8).reshape(3, w)
    diffed = rows.astype(np.int32).copy()
    diffed[:, 1:] = (rows[:, 1:].astype(np.int32) - rows[:, :-1]) & 0xFF
    got = _unpredict(diffed.astype(np.uint8).tobytes(),
                     {"Predictor": 2, "Columns": w})
    assert got == rows.tobytes()


def test_hybrid_xrefstm_entries_beat_classic_free_entries():
    """Hybrid-reference layout (§7.5.8.4): the classic table marks
    object-stream-resident objects FREE (so 1.4 readers skip them)
    while /XRefStm carries their real type-2 entries — the stream's
    entries must win over the same section's free entries."""

    pages = _pages(2, seed=21)
    base = write_pdf(pages, pdf15=True)
    xref_stm_at = int(base.rsplit(b"startxref", 1)[1].split(b"%%EOF")[0].strip())
    out = bytearray(base)
    xref_at = len(out)
    # objects 1-3 (catalog, pages, font) live in the object stream in
    # the pdf15 layout; a hybrid main table hides them as free
    out += b"xref\n0 1\n0000000000 65535 f \n"
    out += b"1 3\n" + b"0000000000 65535 f \n" * 3
    out += (
        f"trailer\n<< /Size 20 /Root 1 0 R /XRefStm {xref_stm_at} >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    hybrid = bytes(out)

    spans_hybrid = extract_document(hybrid)["spans"]
    spans_classic = extract_document(write_pdf(pages))["spans"]
    assert spans_hybrid == spans_classic and len(spans_hybrid) > 0


def test_short_decodeparms_array_does_not_truncate_filter_chain():
    payload = b"short parms must not skip filters" * 3
    encoded = zlib.compress(payload).hex().encode("ascii") + b">"
    obj = {"Filter": ["ASCIIHexDecode", "FlateDecode"], "DecodeParms": [None]}
    assert _decode_stream_data(obj, encoded, lambda v: v) == payload
