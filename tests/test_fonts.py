"""Font-encoding layer (pdfio/fonts.py): AGL glyph-name resolution,
simple-font /Encoding (/BaseEncoding + /Differences), /ToUnicode CMaps
(bfchar + both bfrange forms), Type0/Identity-H composites, and the
end-to-end invariants: CID documents yield IDENTICAL spans to their
simple-font twins, serial and distributed.

Reference parity: the reference gets all of this from PyMuPDF
(reference render.py:89); here the same observable behavior comes from
PDF 32000-1 §9.6.6/§9.7/§9.10 implemented in-engine.
"""

from __future__ import annotations

import numpy as np
import pytest

from pdf_toolkit_spark.corpus import make_document
from pdf_toolkit_spark.extract import extract_document
from pdf_toolkit_spark.pdfio.fonts import (
    FontDecoder,
    build_font_decoder,
    glyph_to_unicode,
    parse_cmap_stream,
    parse_tounicode,
)
from pdf_toolkit_spark.pdfio.parser import PdfDocument
from pdf_toolkit_spark.pdfio.writer import PageSpec, write_pdf


# ---------------------------------------------------------------------------
# AGL subset
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name,want", [
    ("a", "a"), ("Z", "Z"), ("three", "3"), ("space", " "),
    ("quotesingle", "'"), ("eacute", "é"), ("Adieresis", "Ä"),
    ("ccedilla", "ç"), ("oslash", "ø"), ("germandbls", "ß"),
    ("uni0041", "A"), ("uni4E16", "世"), ("u1F600", "😀"),
    ("uni00480065", "He"),  # multi-unit uni name
    ("a.sc", "a"), ("one.oldstyle", "1"),  # variant suffixes
    ("emdash", "—"), ("fi", "ﬁ"), ("Euro", "€"),
])
def test_glyph_to_unicode(name, want):
    assert glyph_to_unicode(name) == want


def test_glyph_to_unicode_unknown_is_none():
    assert glyph_to_unicode("g123") is None
    assert glyph_to_unicode("") is None


# ---------------------------------------------------------------------------
# ToUnicode CMap parsing
# ---------------------------------------------------------------------------

CMAP_BFCHAR = b"""
/CIDInit /ProcSet findresource begin
begincmap
1 begincodespacerange <0000> <FFFF> endcodespacerange
2 beginbfchar
<0001> <0041>
<0002> <4E16>
endbfchar
endcmap
"""

CMAP_BFRANGE = b"""
begincmap
1 beginbfrange
<0010> <0012> <0061>
endbfrange
1 beginbfrange
<0020> <0021> [<00480069> <0042>]
endbfrange
endcmap
"""


def test_parse_tounicode_bfchar():
    m = parse_tounicode(CMAP_BFCHAR)
    assert m == {1: "A", 2: "世"}


def test_parse_tounicode_bfrange_incrementing_and_array():
    m = parse_tounicode(CMAP_BFRANGE)
    assert m[0x10] == "a" and m[0x11] == "b" and m[0x12] == "c"
    assert m[0x20] == "Hi" and m[0x21] == "B"


def test_parse_tounicode_surrogate_pair_destination():
    data = b"1 beginbfchar <0003> <D83DDE00> endbfchar"
    assert parse_tounicode(data) == {3: "😀"}


# ---------------------------------------------------------------------------
# FontDecoder / build_font_decoder
# ---------------------------------------------------------------------------

def _ident(x):
    return x


def test_simple_font_without_encoding_is_legacy():
    assert build_font_decoder({"Subtype": "Type1"}, _ident, _ident) is None


def test_winansi_base_encoding_table():
    dec = build_font_decoder(
        {"Subtype": "Type1", "Encoding": "WinAnsiEncoding"}, _ident, _ident
    )
    # 0x93/0x94 are curly quotes in cp1252, C1 controls in latin-1
    assert dec.decode(b"\x93ok\x94") == "“ok”"
    assert dec.decode(b"\x80") == "€"


def test_differences_override_base():
    font = {
        "Subtype": "Type1",
        "Encoding": {
            "BaseEncoding": "WinAnsiEncoding",
            "Differences": [65, "eacute", "germandbls", 97, "uni4E16"],
        },
    }
    dec = build_font_decoder(font, _ident, _ident)
    assert dec.decode(b"A") == "é"      # 65 remapped
    assert dec.decode(b"B") == "ß"      # 66 follows in sequence
    assert dec.decode(b"a") == "世"     # second block start
    assert dec.decode(b"C") == "C"      # untouched codes keep base
    assert dec.decode(b"\x93") == "“"


def test_unknown_difference_name_is_replacement_char():
    font = {
        "Subtype": "Type1",
        "Encoding": {"Differences": [65, "glyph99999"]},
    }
    dec = build_font_decoder(font, _ident, _ident)
    assert dec.decode(b"A") == "�"


def test_type0_without_tounicode_is_identity():
    dec = build_font_decoder({"Subtype": "Type0"}, _ident, _ident)
    assert dec.width == 2
    assert dec.decode(b"\x00A\x4e\x16") == "A世"


def test_decoder_two_byte_segmentation_drops_trailing_odd_byte():
    dec = FontDecoder(2, cmap={0x41: "x"})
    assert dec.decode(b"\x00\x41\x7f") == "x"


# ---------------------------------------------------------------------------
# Through the parser: hand-built fixture PDFs
# ---------------------------------------------------------------------------

def _pdf_with_font(font_body: bytes, content: bytes, extra_objs: list[bytes] = ()):
    """Minimal single-page PDF with /F1 -> font object 5, content obj 4;
    extra objects appended from number 6."""

    chunks = [
        b"%PDF-1.4\n",
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n",
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 200 100] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>\nendobj\n",
        b"4 0 obj\n<< /Length %d >>\nstream\n" % len(content)
        + content + b"\nendstream\nendobj\n",
        b"5 0 obj\n" + font_body + b"\nendobj\n",
    ]
    for i, body in enumerate(extra_objs):
        chunks.append(b"%d 0 obj\n" % (6 + i) + body + b"\nendobj\n")
    n = len(chunks)
    pdf = bytearray()
    offs = {}
    for i, c in enumerate(chunks):
        if i:
            offs[i] = len(pdf)
        pdf += c
    xref_at = len(pdf)
    pdf += b"xref\n0 %d\n0000000000 65535 f \n" % n
    for i in range(1, n):
        pdf += b"%010d 00000 n \n" % offs[i]
    pdf += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (n, xref_at))
    return bytes(pdf)


def _texts(pdf: bytes) -> list[str]:
    page = PdfDocument(pdf).load_page(0)
    return [it[1] for it in page.items if it[0] == "text"]


def test_differences_font_through_parser():
    font = (b"<< /Type /Font /Subtype /Type1 /BaseFont /Custom "
            b"/Encoding << /Differences [65 /eacute /germandbls] >> >>")
    content = b"BT /F1 12 Tf 10 50 Td (AB ok) Tj ET"
    assert _texts(_pdf_with_font(font, content)) == ["éß ok"]


def test_tounicode_on_simple_font_through_parser():
    cmap = b"1 beginbfchar <41> <4E16> endbfchar"
    font = (b"<< /Type /Font /Subtype /TrueType /BaseFont /Sub "
            b"/ToUnicode 6 0 R >>")
    tu = b"<< /Length %d >>\nstream\n" % len(cmap) + cmap + b"\nendstream"
    content = b"BT /F1 12 Tf 10 50 Td (A-ok) Tj ET"
    assert _texts(_pdf_with_font(font, content, [tu])) == ["世-ok"]


def test_identity_h_tounicode_through_parser():
    cmap = (b"2 beginbfchar\n<0001> <0047></n<0002> <006F>\nendbfchar"
            .replace(b"</n", b"\n"))
    font = (b"<< /Type /Font /Subtype /Type0 /BaseFont /S "
            b"/Encoding /Identity-H /DescendantFonts [7 0 R] "
            b"/ToUnicode 6 0 R >>")
    tu = b"<< /Length %d >>\nstream\n" % len(cmap) + cmap + b"\nendstream"
    desc = (b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /S "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
            b"/Supplement 0 >> >>")
    content = b"BT /F1 12 Tf 10 50 Td <00010002> Tj ET"
    assert _texts(_pdf_with_font(font, content, [tu, desc])) == ["Go"]


def test_font_state_saved_by_q_restored_by_Q():
    font = (b"<< /Type /Font /Subtype /Type1 "
            b"/Encoding << /Differences [65 /eacute] >> >>")
    content = (b"BT /F1 12 Tf 10 80 Td (A) Tj ET "
               b"q BT /F1 12 Tf 10 50 Td (A) Tj ET Q "
               b"BT 10 20 Td (A) Tj ET")
    # all three shows use F1 (the q/Q pair must not clear the state)
    assert _texts(_pdf_with_font(font, content)) == ["é", "é", "é"]


# ---------------------------------------------------------------------------
# Writer round-trip + corpus invariants
# ---------------------------------------------------------------------------

def test_cid_writer_roundtrips_nonlatin_text():
    raster = np.full((100, 80), 220, np.uint8)
    text = "Grüße 世界 — done!"
    pdf = write_pdf(
        [PageSpec(raster=raster, items=[("text", text, 20, 10)])], cid_font=True
    )
    assert text.encode("latin-1", "ignore") not in pdf.replace(b" ", b"")
    assert _texts(pdf) == [text]


@pytest.mark.parametrize("doc_id", [0, 1, 4])  # classic + pdf15 + spread class
def test_cid_corpus_doc_spans_equal_simple_font_twin(doc_id):
    plain = make_document(doc_id, seed=42, mega_every=0)
    cid = make_document(doc_id, seed=42, mega_every=0, cid_every=1)
    assert plain["pdf_bytes"] != cid["pdf_bytes"]
    s_plain = extract_document(plain["pdf_bytes"])["spans"]
    s_cid = extract_document(cid["pdf_bytes"])["spans"]
    assert [
        (s["kind"], s["text"], s["offset"]) for s in s_plain
    ] == [(s["kind"], s["text"], s["offset"]) for s in s_cid]


# ---------------------------------------------------------------------------
# Embedded CMap streams + predefined Unicode CMaps (PDF 32000-1 §9.7.5)
# ---------------------------------------------------------------------------

def test_parse_cmap_stream_codespaces_and_cidranges():
    data = (b"2 begincodespacerange\n<00> <7f>\n<8000> <ffff>\n"
            b"endcodespacerange\n"
            b"1 begincidrange\n<8000> <8002> 100\nendcidrange\n"
            b"1 begincidchar\n<41> 7\nendcidchar\n")
    spaces, cid_map = parse_cmap_stream(data)
    assert spaces == [(b"\x00", b"\x7f"), (b"\x80\x00", b"\xff\xff")]
    assert cid_map[0x8000] == 100 and cid_map[0x8002] == 102
    assert cid_map[0x41] == 7


def test_parse_cmap_stream_skips_implausible_range():
    data = b"1 begincidrange\n<00000000> <7fffffff> 0\nendcidrange\n"
    _, cid_map = parse_cmap_stream(data)
    assert cid_map == {}


def test_codespace_segmentation_is_bytewise():
    # <81> sits inside [0x80,0xff] for byte 0 of the 2-byte space, so
    # 81 40 is ONE 2-byte code even though 0x40 alone is 1-byte-legal
    dec = FontDecoder(
        2,
        cmap={0x8140: "丁", 0x41: "A"},
        codespaces=[(b"\x00", b"\x7f"), (b"\x80\x00", b"\xff\xff")],
    )
    assert dec.decode(b"\x41\x81\x40\x41") == "A丁A"


def test_predefined_utf16_cmap_decodes_surrogate_pairs():
    font = {"Subtype": "Type0", "Encoding": "UniJIS-UTF16-H"}
    dec = build_font_decoder(font, lambda x: x, lambda x: b"")
    assert dec is not None
    b = "a😀".encode("utf-16-be")
    assert dec.decode(b) == "a😀"


def test_predefined_ucs2_cmap_is_bmp_identity():
    font = {"Subtype": "Type0", "Encoding": "UniGB-UCS2-H"}
    dec = build_font_decoder(font, lambda x: x, lambda x: b"")
    assert dec is not None
    assert dec.decode("世界".encode("utf-16-be")) == "世界"


def test_embedded_cmap_writer_roundtrips_mixed_width_text():
    raster = np.full((100, 80), 220, np.uint8)
    text = "mix: Grüße 世界!"
    pdf = write_pdf(
        [PageSpec(raster=raster, items=[("text", text, 20, 10)])],
        cid_font="embedded",
    )
    assert b"begincodespacerange" in pdf
    assert _texts(pdf) == [text]


def test_ucs2_writer_roundtrips_cjk_without_tounicode():
    raster = np.full((100, 80), 220, np.uint8)
    text = "日本語テスト ok"
    pdf = write_pdf(
        [PageSpec(raster=raster, items=[("text", text, 20, 10)])],
        cid_font="ucs2",
    )
    assert b"/UniJIS-UCS2-H" in pdf and b"/ToUnicode" not in pdf
    assert _texts(pdf) == [text]


def test_ucs2_writer_rejects_non_bmp():
    """A non-BMP char would emit 5+ hex digits into the 2-byte UCS-2
    code stream — fail closed, never desync silently."""

    from pdf_toolkit_spark.errors import UserError

    raster = np.full((100, 80), 220, np.uint8)
    with pytest.raises(UserError, match="non-BMP"):
        write_pdf(
            [PageSpec(raster=raster, items=[("text", "ok \U0001f600", 20, 10)])],
            cid_font="ucs2",
        )


@pytest.mark.parametrize("doc_id", [1, 2])  # embedded + ucs2 corpus strides
def test_cmap_corpus_doc_spans_equal_simple_font_twin(doc_id):
    plain = make_document(doc_id, seed=42, mega_every=0)
    cid = make_document(doc_id, seed=42, mega_every=0, cid_every=1)
    assert plain["pdf_bytes"] != cid["pdf_bytes"]
    s_plain = extract_document(plain["pdf_bytes"])["spans"]
    s_cid = extract_document(cid["pdf_bytes"])["spans"]
    assert [
        (s["kind"], s["text"], s["offset"]) for s in s_plain
    ] == [(s["kind"], s["text"], s["offset"]) for s in s_cid]
