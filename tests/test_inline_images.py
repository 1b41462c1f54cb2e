"""Inline images (BI/ID/EI, PDF 32000-1 §8.9.7): raw and filtered
variants, abbreviation mapping, document-order placement among text
items, and graceful skipping of unsupported forms."""

from __future__ import annotations

import zlib

import numpy as np

from pdf_toolkit_spark.pdfio.parser import PdfDocument


def _build_pdf(content: bytes, w: int = 60, h: int = 40) -> bytes:
    chunks = [
        b"%PDF-1.4\n",
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n",
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d] "
        b"/Contents 4 0 R >>\nendobj\n" % (w, h),
        b"4 0 obj\n<< /Length %d >>\nstream\n" % len(content)
        + content + b"\nendstream\nendobj\n",
    ]
    pdf = bytearray()
    offs = {}
    for i, c in enumerate(chunks):
        if i:
            offs[i] = len(pdf)
        pdf += c
    xref_at = len(pdf)
    pdf += b"xref\n0 5\n0000000000 65535 f \n"
    for i in range(1, 5):
        pdf += b"%010d 00000 n \n" % offs[i]
    pdf += b"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % xref_at
    return bytes(pdf)


RNG = np.random.default_rng(2)
GRAY = RNG.integers(0, 256, (8, 10), dtype=np.uint8).astype(np.uint8)


def test_raw_inline_gray_image():
    c = b"q 10 0 0 8 5 20 cm BI /W 10 /H 8 /BPC 8 /CS /G ID " + GRAY.tobytes() + b" EI Q"
    page = PdfDocument(_build_pdf(c)).load_page(0)
    items = [it for it in page.items if it[0] == "image"]
    assert len(items) == 1 and np.array_equal(items[0][1], GRAY)


def test_flate_inline_rgb_image():
    rgb = RNG.integers(0, 256, (6, 7, 3), dtype=np.uint8).astype(np.uint8)
    c = (b"q 7 0 0 6 2 10 cm BI /W 7 /H 6 /BPC 8 /CS /RGB /F /Fl ID "
         + zlib.compress(rgb.tobytes()) + b" EI Q")
    page = PdfDocument(_build_pdf(c)).load_page(0)
    items = [it for it in page.items if it[0] == "image"]
    assert len(items) == 1 and np.array_equal(items[0][1], rgb)


def test_asciihex_inline_image_keeps_document_order():
    hx = GRAY.tobytes().hex().encode()
    c = (b"BT /F1 10 Tf 3 30 Td (before) Tj ET "
         b"q 10 0 0 8 0 0 cm BI /W 10 /H 8 /BPC 8 /CS /G /F /AHx ID "
         + hx + b"> EI Q BT 3 5 Td (after) Tj ET")
    page = PdfDocument(_build_pdf(c)).load_page(0)
    kinds = [it[0] for it in page.items]
    assert kinds == ["text", "image", "text"]
    assert [it[1] for it in page.items if it[0] == "text"] == ["before", "after"]
    assert np.array_equal([it for it in page.items if it[0] == "image"][0][1], GRAY)


def test_unsupported_inline_mask_skipped_gracefully():
    c = (b"BI /W 8 /H 8 /BPC 1 /IM true ID " + bytes(8)
         + b" EI BT 3 5 Td (still here) Tj ET")
    page = PdfDocument(_build_pdf(c)).load_page(0)
    assert [it[1] for it in page.items if it[0] == "text"] == ["still here"]
    assert not [it for it in page.items if it[0] == "image"]


def test_full_page_inline_image_becomes_scan():
    full = RNG.integers(0, 256, (40, 60), dtype=np.uint8).astype(np.uint8)
    c = b"q 60 0 0 40 0 0 cm BI /W 60 /H 40 /BPC 8 /CS /G /F /Fl ID " + zlib.compress(
        full.tobytes()
    ) + b" EI Q"
    page = PdfDocument(_build_pdf(c)).load_page(0)
    assert page.scan is not None and np.array_equal(page.scan, full)
    assert not page.items


def test_ei_inside_binary_data_is_not_a_terminator():
    """Raw data whose bytes happen to contain ' EI ' must not truncate:
    unfiltered data length is computed from W/H/BPC, not by searching."""

    tricky = bytearray(GRAY.tobytes())
    tricky[11:15] = b" EI "  # embed a fake terminator inside the pixels
    c = b"q 10 0 0 8 5 20 cm BI /W 10 /H 8 /BPC 8 /CS /G ID " + bytes(tricky) + b" EI Q"
    page = PdfDocument(_build_pdf(c)).load_page(0)
    items = [it for it in page.items if it[0] == "image"]
    assert len(items) == 1
    assert np.array_equal(items[0][1], np.frombuffer(bytes(tricky), np.uint8).reshape(8, 10))


def test_decode_array_inversion():
    """/Decode [1 0] image XObjects invert sample values (§8.9.5.2)."""

    import zlib as _z

    img = RNG.integers(0, 256, (8, 10), dtype=np.uint8).astype(np.uint8)
    data = _z.compress(img.tobytes())
    chunks = [
        b"%PDF-1.4\n",
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n",
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 60 40] "
        b"/Contents 4 0 R /Resources << /XObject << /Im0 5 0 R >> >> >>\nendobj\n",
        b"4 0 obj\n<< /Length 30 >>\nstream\nq 10 0 0 8 5 20 cm /Im0 Do Q\nendstream\nendobj\n",
        b"5 0 obj\n<< /Type /XObject /Subtype /Image /Width 10 /Height 8 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /FlateDecode "
        b"/Decode [1 0] /Length %d >>\nstream\n" % len(data)
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
    page = PdfDocument(bytes(pdf)).load_page(0)
    items = [it for it in page.items if it[0] == "image"]
    assert len(items) == 1 and np.array_equal(items[0][1], 255 - img)


def test_quote_and_tstar_text_operators():
    """TL / T* / ' / " advance the text line and show text — real PDFs
    lay out paragraphs this way; skipping them silently loses text."""

    c = (b"BT /F1 10 Tf 12 TL 5 30 Td (first) Tj (second) ' "
         b"(third) ' 1 2 (fourth) \" T* (fifth) Tj ET")
    page = PdfDocument(_build_pdf(c)).load_page(0)
    texts = [(it[1], it[2]) for it in page.items if it[0] == "text"]
    assert [t for t, _ in texts] == ["first", "second", "third", "fourth", "fifth"]
    rows = [r for _, r in texts]
    assert rows == sorted(rows) and len(set(rows)) == 5  # each ' drops one leading


def _build_with_objects(objs_extra: list, content: bytes, w=60, h=40,
                        resources=b"/XObject << /Fm0 5 0 R >>") -> bytes:
    chunks = [
        b"%PDF-1.4\n",
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n",
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d] "
        b"/Contents 4 0 R /Resources << %s >> >>\nendobj\n" % (w, h, resources),
        b"4 0 obj\n<< /Length %d >>\nstream\n" % len(content)
        + content + b"\nendstream\nendobj\n",
    ] + objs_extra
    pdf = bytearray()
    offs = {}
    for i, c in enumerate(chunks):
        if i:
            offs[i] = len(pdf)
        pdf += c
    xref_at = len(pdf)
    pdf += b"xref\n0 %d\n0000000000 65535 f \n" % len(chunks)
    for i in range(1, len(chunks)):
        pdf += b"%010d 00000 n \n" % offs[i]
    pdf += b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % (
        len(chunks), xref_at)
    return bytes(pdf)


def test_form_xobject_expands_with_matrix_and_nested_image():
    """/Subtype /Form invocations splice their content at the call
    site: the form's /Matrix composes into the CTM (the nested image
    lands translated) and form-local resource names resolve without
    colliding with the page's."""

    img = RNG.integers(0, 256, (8, 10), dtype=np.uint8).astype(np.uint8)
    imgdata = zlib.compress(img.tobytes())
    form_body = b"BT /F1 8 Tf 2 6 Td (inside form) Tj ET q 10 0 0 8 0 0 cm /Im9 Do Q"
    form_obj = (
        b"5 0 obj\n<< /Type /XObject /Subtype /Form /BBox [0 0 30 20] "
        b"/Matrix [1 0 0 1 10 5] /Resources << /XObject << /Im9 6 0 R >> >> "
        b"/Length %d >>\nstream\n" % len(form_body)
        + form_body + b"\nendstream\nendobj\n"
    )
    img_obj = (
        b"6 0 obj\n<< /Type /XObject /Subtype /Image /Width 10 /Height 8 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /FlateDecode "
        b"/Length %d >>\nstream\n" % len(imgdata)
        + imgdata + b"\nendstream\nendobj\n"
    )
    content = (b"BT /F1 10 Tf 3 35 Td (page text) Tj ET "
               b"q 1 0 0 1 0 0 cm /Fm0 Do Q BT 3 2 Td (tail) Tj ET")
    page = PdfDocument(_build_with_objects([form_obj, img_obj], content)).load_page(0)
    texts = [it[1] for it in page.items if it[0] == "text"]
    assert texts == ["page text", "inside form", "tail"]  # document order kept
    imgs = [it for it in page.items if it[0] == "image"]
    assert len(imgs) == 1 and np.array_equal(imgs[0][1], img)
    assert imgs[0][3] == 10  # /Matrix translate reached the placement


def test_recursive_form_is_depth_bounded():
    body = b"q /Fm0 Do Q BT 1 1 Td (r) Tj ET"
    form = (
        b"5 0 obj\n<< /Type /XObject /Subtype /Form /BBox [0 0 30 20] "
        b"/Resources << /XObject << /Fm0 5 0 R >> >> /Length %d >>\nstream\n" % len(body)
        + body + b"\nendstream\nendobj\n"
    )
    page = PdfDocument(_build_with_objects([form], b"/Fm0 Do")).load_page(0)
    n = sum(1 for it in page.items if it[0] == "text")
    assert 1 <= n <= 8  # bounded, no stack overflow


def _xobject_pdf(xobj_dict: bytes, data: bytes, extra_objs: bytes = b"") -> bytes:
    chunks = [
        b"%PDF-1.4\n",
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n",
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 60 40] "
        b"/Contents 4 0 R /Resources << /XObject << /Im0 5 0 R >> >> >>\nendobj\n",
        b"4 0 obj\n<< /Length 29 >>\nstream\nq 10 0 0 8 5 20 cm /Im0 Do Q\nendstream\nendobj\n",
        b"5 0 obj\n" + xobj_dict + b"\nstream\n" + data + b"\nendstream\nendobj\n",
    ]
    if extra_objs:
        chunks.append(extra_objs)
    pdf = bytearray()
    offs = {}
    for i, c in enumerate(chunks):
        if i:
            offs[i] = len(pdf)
        pdf += c
    xref_at = len(pdf)
    pdf += b"xref\n0 %d\n0000000000 65535 f \n" % len(chunks)
    for i in range(1, len(chunks)):
        pdf += b"%010d 00000 n \n" % offs[i]
    pdf += b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % (
        len(chunks), xref_at)
    return bytes(pdf)


def test_indexed_colorspace_image_expands_through_palette():
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]], np.uint8)
    idx = RNG.integers(0, 4, (8, 10), dtype=np.uint8).astype(np.uint8)
    data = zlib.compress(idx.tobytes())
    xobj = (
        b"<< /Type /XObject /Subtype /Image /Width 10 /Height 8 "
        b"/ColorSpace [/Indexed /DeviceRGB 3 <" + palette.tobytes().hex().encode() + b">] "
        b"/BitsPerComponent 8 /Filter /FlateDecode /Length %d >>" % len(data)
    )
    page = PdfDocument(_xobject_pdf(xobj, data)).load_page(0)
    items = [it for it in page.items if it[0] == "image"]
    assert len(items) == 1
    assert np.array_equal(items[0][1], palette[idx])


def test_device_cmyk_image_converts_to_rgb():
    cmyk = np.zeros((8, 10, 4), np.uint8)
    cmyk[..., 0] = 255  # pure cyan
    cmyk[0, :, :] = [0, 0, 0, 255]  # black row
    data = zlib.compress(cmyk.tobytes())
    xobj = (
        b"<< /Type /XObject /Subtype /Image /Width 10 /Height 8 "
        b"/ColorSpace /DeviceCMYK /BitsPerComponent 8 /Filter /FlateDecode "
        b"/Length %d >>" % len(data)
    )
    page = PdfDocument(_xobject_pdf(xobj, data)).load_page(0)
    items = [it for it in page.items if it[0] == "image"]
    assert len(items) == 1
    arr = items[0][1]
    assert arr.shape == (8, 10, 3)
    assert np.array_equal(arr[1, 0], [0, 255, 255])  # cyan
    assert np.array_equal(arr[0, 0], [0, 0, 0])      # black


def _pack_bits(vals: np.ndarray, bpc: int) -> bytes:
    out = bytearray()
    for row in vals:
        b = 0
        nb = 0
        for v in row:
            b = (b << bpc) | int(v)
            nb += bpc
            while nb >= 8:
                out.append((b >> (nb - 8)) & 0xFF)
                nb -= 8
        if nb:
            out.append((b << (8 - nb)) & 0xFF)
    return bytes(out)


def test_sub8bit_gray_images_scale_to_full_range():
    for bpc in (1, 2, 4):
        maxv = (1 << bpc) - 1
        img = RNG.integers(0, maxv + 1, (8, 10), dtype=np.uint8).astype(np.uint8)
        data = zlib.compress(_pack_bits(img, bpc))
        xobj = (
            b"<< /Type /XObject /Subtype /Image /Width 10 /Height 8 "
            b"/ColorSpace /DeviceGray /BitsPerComponent %d /Filter /FlateDecode "
            b"/Length %d >>" % (bpc, len(data))
        )
        page = PdfDocument(_xobject_pdf(xobj, data)).load_page(0)
        items = [it for it in page.items if it[0] == "image"]
        expected = (img.astype(np.uint16) * 255 // maxv).astype(np.uint8)
        assert len(items) == 1 and np.array_equal(items[0][1], expected), bpc


def test_16bit_gray_image_keeps_high_byte():
    img16 = RNG.integers(0, 1 << 16, (8, 10), dtype=np.uint16).astype(">u2")
    data = zlib.compress(img16.tobytes())
    xobj = (
        b"<< /Type /XObject /Subtype /Image /Width 10 /Height 8 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 16 /Filter /FlateDecode "
        b"/Length %d >>" % len(data)
    )
    page = PdfDocument(_xobject_pdf(xobj, data)).load_page(0)
    items = [it for it in page.items if it[0] == "image"]
    assert len(items) == 1
    assert np.array_equal(items[0][1], (img16.astype(np.uint16) >> 8).astype(np.uint8))


def test_indexed_4bit_palette_image():
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], np.uint8)
    idx = RNG.integers(0, 4, (8, 10), dtype=np.uint8).astype(np.uint8)
    data = zlib.compress(_pack_bits(idx, 4))
    xobj = (
        b"<< /Type /XObject /Subtype /Image /Width 10 /Height 8 "
        b"/ColorSpace [/Indexed /DeviceRGB 3 <" + palette.tobytes().hex().encode() + b">] "
        b"/BitsPerComponent 4 /Filter /FlateDecode /Length %d >>" % len(data)
    )
    page = PdfDocument(_xobject_pdf(xobj, data)).load_page(0)
    items = [it for it in page.items if it[0] == "image"]
    assert len(items) == 1 and np.array_equal(items[0][1], palette[idx])


def test_utf16be_text_strings_decode():
    """BOM-prefixed UTF-16BE text strings (§7.9.2.2) — common in PDFs
    carrying non-Latin text — decode to the real characters."""

    text = "Grüße 世界"
    payload = b"\xfe\xff" + text.encode("utf-16-be")
    esc = payload.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
    c = b"BT /F1 10 Tf 3 30 Td (" + esc + b") Tj ET"
    page = PdfDocument(_build_pdf(c)).load_page(0)
    assert [it[1] for it in page.items if it[0] == "text"] == [text]


def test_filtered_ei_collision_retries_boundary():
    """Filtered payload containing whitespace+'EI' must not truncate the
    image or desynchronize the token stream: the parser retries
    successive EI candidates until one decodes."""

    raw = b"A EI B CD"  # 1x9 gray row; RL literal run embeds ' EI '
    rle = b"\x08" + raw + b"\x80"
    assert b" EI " in rle
    c = (b"q 9 0 0 1 0 0 cm BI /W 9 /H 1 /BPC 8 /CS /G /F /RL ID "
         + rle + b" EI Q BT 3 5 Td (after) Tj ET")
    page = PdfDocument(_build_pdf(c)).load_page(0)
    imgs = [it for it in page.items if it[0] == "image"]
    assert len(imgs) == 1 and imgs[0][1].tobytes() == raw
    assert [it[1] for it in page.items if it[0] == "text"] == ["after"]
