"""Deterministic synthetic fixture corpus (seed-stable, no external data).

Generates the FIXTURES.md §2 document classes as real PDF byte streams
via ``pdfio.writer``: plain text docs (with repeated headers/footers on
longer docs to exercise boilerplate strip), rotated scans, two-page
spread books (the reference's synthetic-spread geometry,
/root/reference/tests/test_page_images.py:42-50), outer-bar spreads,
mixed text+image pages, all-dark fallback pages, and occasional
mega-PDFs for skew-salting tests.

Every document is a pure function of (seed, doc_id) — byte-identical
across runs, which the resume/idempotence tests rely on.
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np

from . import kernels as K
from .config import effective_config
from .pdfio.writer import PageSpec, write_pdf

WORDS = (
    "the quick brown fox jumps over lazy dog page table scan merge sort "
    "filter join window batch stream shuffle partition bucket salt spread "
    "gutter crop margin rotate span text media offset lineage metric"
).split()

DOC_CLASSES = (
    "plain_text",
    "rotated_scan",
    "spread_book",
    "outer_bar",
    "mixed",
    "all_dark",
)


def corpus_config() -> dict[str, Any]:
    """Extraction config used for the fixture corpus: auto outer-clamp
    so the bar-strip path is exercised end-to-end.

    chunk_spread="input": the fixture corpus is bytes-mode (inline
    pdf_bytes, no locators), so the chunk-spread repartition would move
    every PDF byte through one full shuffle write+read purely for load
    balance — the single largest avoidable byte pass in the job (guide
    §2.4; spans are pinned equal across both modes by
    test_chunk_spread_input_matches_shuffle). The source partitioning
    (documents_as_pdfs repartitions to 4 waves/core before the wrap
    UDF) already provides the balance the shuffle bought."""

    return effective_config(overrides={
        "outer_margin_mode": "auto",
        "pages_per_chunk": 64,
        "chunk_spread": "input",
    })


def _sentence(rng: np.random.Generator, n_words: int) -> str:
    return " ".join(WORDS[i] for i in rng.integers(0, len(WORDS), size=n_words))


#: Corpus profiles. "scan": large noise rasters — realistic byte volume
#: and FlateDecode cost (io-heavy). "textual": quarter-size tiled
#: rasters — per-doc cost dominated by parse/tokenize/kernel CPU rather
#: than byte traffic (used to measure engine scaling on hosts whose
#: shared memory bus saturates before the CPUs do).
_PROFILE = {
    "scan": dict(portrait=(800, 560), spread=(800, 1600), mega=(400, 280), tiled=False),
    "textual": dict(portrait=(200, 140), spread=(200, 400), mega=(100, 70), tiled=True),
}


def _textured(rng: np.random.Generator, h: int, w: int, base: int, amp: int,
              tiled: bool = False) -> np.ndarray:
    """Scan-like texture within base±amp (threshold semantics stable).
    Noise mode mirrors real scan entropy (~1.7x deflate); tiled mode is
    cheap/compressible for CPU-bound benchmarking."""

    if tiled:
        tile = rng.integers(base - amp, base + amp + 1, size=(16, 16))
        return np.tile(tile, (h // 16 + 1, w // 16 + 1))[:h, :w].astype(np.uint8)
    return rng.integers(base - amp, base + amp + 1, size=(h, w)).astype(np.uint8)


def _portrait_raster(rng: np.random.Generator, h: int, w: int, tiled: bool) -> np.ndarray:
    return _textured(rng, h, w, base=245, amp=8, tiled=tiled)


def _spread_raster(rng: np.random.Generator, dims: tuple[int, int], tiled: bool,
                   bar_px: int = 0) -> np.ndarray:
    """Reference spread geometry rescaled: dark textured bg, two bright
    textured pages, dark center gutter; optional dark outer bars."""

    h, w = dims
    img = _textured(rng, h, w, base=20, amp=5, tiled=tiled)
    # page boxes and gutter at the reference's proportions (x:0.05-0.44,
    # 0.56-0.95; y:0.075-0.925; gutter band centered, ~2.5% wide)
    y0, y1 = int(0.075 * h), int(0.925 * h)
    img[y0:y1, int(0.05 * w) : int(0.44 * w)] = _textured(
        rng, y1 - y0, int(0.44 * w) - int(0.05 * w), base=245, amp=8, tiled=tiled)
    img[y0:y1, int(0.5625 * w) : int(0.95 * w)] = _textured(
        rng, y1 - y0, int(0.95 * w) - int(0.5625 * w), base=245, amp=8, tiled=tiled)
    img[:, int(0.4875 * w) : int(0.5125 * w) + 1] = 5
    if bar_px > 0:
        img[:, :bar_px] = 5
        img[:, w - bar_px :] = 5
    return img


def _text_items_for_page(
    rng: np.random.Generator, page_h: int, page_w: int, n: int, col_lo: int, col_hi: int
) -> list[tuple]:
    items = []
    for i in range(n):
        row = 30 + i * max(12, (page_h - 60) // max(1, n))
        col = int(rng.integers(col_lo, max(col_lo + 1, col_hi)))
        items.append(("text", _sentence(rng, int(rng.integers(4, 10))), min(row, page_h - 10), col))
    return items


def _with_header_footer(items: list[tuple], page_no: int, page_h: int, page_w: int) -> list[tuple]:
    header = ("text", "CHAPTER ONE", 5, page_w // 4)
    footer = ("text", str(page_no + 1), page_h - 6, page_w // 2)
    return [header, *items, footer]


def _inverse_rotate_page(upright: PageSpec, rotate: int) -> PageSpec:
    """Store a page so that display-rotation by /Rotate yields the
    upright layout (generator-side inverse of rotation normalization)."""

    if rotate % 360 == 0:
        return upright
    inv = (360 - rotate) % 360
    up_h, up_w = upright.raster.shape[:2]
    stored_raster = K.rotate_image_cw(upright.raster, inv)
    stored_items = []
    for item in upright.items:
        kind = item[0]
        row, col = K.rotate_point_cw(item[2], item[3], up_h, up_w, inv)
        if kind == "image":
            stored_items.append((kind, K.rotate_image_cw(item[1], inv), int(row), int(col)))
        else:
            stored_items.append((kind, item[1], int(row), int(col)))
    return PageSpec(raster=stored_raster, rotate=rotate, items=stored_items)


def make_document(
    doc_id: int, seed: int = 42, mega_every: int = 50, profile: str = "scan",
    jpeg_every: int = 0, encrypt_every: int = 0, cid_every: int = 0,
) -> dict[str, Any]:
    """Build one document; returns {doc_id, pdf_bytes, n_pages, doc_class}.

    ``jpeg_every=k`` makes every k-th document ship its rasters as
    DCTDecode (baseline JPEG) image XObjects instead of FlateDecode —
    the dominant encoding of real-world scanned PDFs. Deterministic
    like everything else (the engine's own encoder, fixed quality).

    ``encrypt_every=k`` encrypts every k-th document with an empty
    user password, cycling RC4-40 (R2), AESV2 (V4/R4), and AES-256
    (V5/R6) across both container layouts so every decryption path
    runs inside the distributed pipeline (spans are unaffected).

    ``cid_every=k`` writes every k-th document's text through a Type0
    /Identity-H composite font with a /ToUnicode CMap (the real-world
    subsetted-font shape): show strings carry 2-byte glyph codes and
    only the font-decoding layer recovers the original text, so span
    equality proves CID decoding end-to-end.
    """

    prof = _PROFILE[profile]
    tiled = prof["tiled"]
    H, W = prof["portrait"]
    SH, SW = prof["spread"]
    MH, MW = prof["mega"]

    rng = np.random.default_rng([seed, doc_id])
    if mega_every and doc_id % mega_every == mega_every - 1:
        doc_class = "mega_pdf"
    else:
        doc_class = DOC_CLASSES[doc_id % len(DOC_CLASSES)]

    pages: list[PageSpec] = []
    if doc_class == "plain_text":
        n_pages = int(rng.integers(1, 7))
        for p in range(n_pages):
            raster = _portrait_raster(rng, H, W, tiled)
            items = _text_items_for_page(
                rng, H, W, int(rng.integers(16, 25)), int(0.07 * W), int(0.85 * W))
            if n_pages >= 4:
                items = _with_header_footer(items, p, H, W)
            pages.append(PageSpec(raster=raster, items=items))
    elif doc_class == "rotated_scan":
        n_pages = int(rng.integers(1, 5))
        for p in range(n_pages):
            raster = _portrait_raster(rng, H, W, tiled)
            items = _text_items_for_page(
                rng, H, W, int(rng.integers(12, 20)), int(0.07 * W), int(0.85 * W))
            upright = PageSpec(raster=raster, items=items)
            rotate = int(rng.choice([90, 180, 270]))
            pages.append(_inverse_rotate_page(upright, rotate))
    elif doc_class == "spread_book":
        n_pages = int(rng.integers(1, 4))
        for _ in range(n_pages):
            raster = _spread_raster(rng, (SH, SW), tiled)
            left = _text_items_for_page(
                rng, SH, SW, int(rng.integers(8, 13)), int(0.075 * SW), int(0.40 * SW))
            right = _text_items_for_page(
                rng, SH, SW, int(rng.integers(8, 13)), int(0.5875 * SW), int(0.925 * SW))
            pages.append(PageSpec(raster=raster, items=left + right))
    elif doc_class == "outer_bar":
        n_pages = int(rng.integers(1, 3))
        for _ in range(n_pages):
            bar = int(rng.integers(int(0.025 * SW), int(0.045 * SW)))
            raster = _spread_raster(rng, (SH, SW), tiled, bar_px=bar)
            items = _text_items_for_page(rng, SH, SW, 10, int(0.1 * SW), int(0.9 * SW))
            pages.append(PageSpec(raster=raster, items=items))
    elif doc_class == "mixed":
        n_pages = int(rng.integers(1, 4))
        # Alternate gray / RGB mixed docs: the color path (DeviceRGB
        # XObjects, ITU-R 601 gray analysis, RGB media blobs) is
        # exercised end-to-end by the same corpus and equality gate.
        color = (doc_id // len(DOC_CLASSES)) % 2 == 0
        for _ in range(n_pages):
            raster = _portrait_raster(rng, H, W, tiled)
            if color:
                raster = np.stack(
                    [raster,
                     _portrait_raster(rng, H, W, tiled),
                     _portrait_raster(rng, H, W, tiled)], axis=-1)
            side = max(16, int(0.1 * W))
            eh, ew = int(rng.integers(side, 2 * side)), int(rng.integers(side, 2 * side))
            embedded = _textured(rng, eh, ew, base=128, amp=64)
            if color:
                embedded = np.stack(
                    [embedded,
                     _textured(rng, eh, ew, base=128, amp=64),
                     _textured(rng, eh, ew, base=128, amp=64)], axis=-1)
            items = [
                ("text", _sentence(rng, 6), int(0.15 * H), int(0.085 * W)),
                ("image", embedded, int(0.3 * H), int(0.14 * W)),
                ("text", _sentence(rng, 5), int(0.6 * H), int(0.085 * W)),
            ]
            pages.append(PageSpec(raster=raster, items=items))
    elif doc_class == "all_dark":
        pages.append(PageSpec(raster=_textured(rng, H // 2, int(0.54 * W), base=10, amp=5,
                                               tiled=tiled),
                              items=[("text", _sentence(rng, 4), int(0.2 * H), int(0.1 * W))]))
    elif doc_class == "mega_pdf":
        n_pages = int(rng.integers(150, 220))
        for p in range(n_pages):
            raster = _portrait_raster(rng, MH, MW, tiled)
            items = _with_header_footer(
                [("text", _sentence(rng, 5), int(0.1 * MH) + int(0.075 * MH) * i, int(0.086 * MW))
                 for i in range(8)], p, MH, MW
            )
            pages.append(PageSpec(raster=raster, items=items))
    else:  # pragma: no cover
        raise ValueError(doc_class)

    if jpeg_every and doc_id % jpeg_every == 0:
        # cycle the seven real-world scan codecs: DCT (photo scans),
        # Group-4 fax and generic-region JBIG2 (B/W scans; rasters
        # thresholded to 1-bit, so the serial oracle sees the same
        # binarization), lossless JPEG 2000 (archival masters), lossy
        # 9/7 JPEG 2000 (the dominant archival-scan profile),
        # symbol/text-region JBIG2 with a /JBIG2Globals dictionary
        # (what production scanned-text encoders emit), and SDHUFF
        # symbol JBIG2 with the predefined Annex B table selections
        # (the fax-era hardware-encoder profile). Mega docs fall
        # back to DCT on the jpx/symbol-jbig2 slots: the pure-Python
        # EBCOT / component coders at ~150-220 noise pages per doc
        # would dominate fixture generation for no extra coverage
        # (the chunked path x codecs is covered by the portrait and
        # spread classes).
        # slot order matters: odd slots land on the content-bearing
        # outer_bar class (doc_id%6==3), so the three codecs that need
        # actual glyphs/content — the two symbol-JBIG2 organizations
        # and lossless JPX — sit at slots 1/3/5
        codec = (
            "jpeg", "jbig2hufstd", "jbig2", "jpx", "jpx97", "jbig2s", "ccitt",
        )[(doc_id // jpeg_every) % 7]
        if codec == "jbig2hufstd" and (doc_id // (jpeg_every * 7)) % 2:
            # successive visits to the SDHUFF slot alternate the
            # predefined-table profile: B.4/B.2/B.6/B.8/B.11, then
            # the alternate B.5/B.3/B.7/B.10/B.13 selections
            codec = "jbig2hufalt"
        if codec == "jpx" and (doc_id // (jpeg_every * 7)) % 2:
            # successive visits to the lossless-JPX slot alternate the
            # per-component COC override profile (depth/geometry/style
            # re-specified per component — still lossless)
            codec = "jpxcoc"
        if codec == "jpx97" and (doc_id // (jpeg_every * 7)) % 2:
            # successive visits to the lossy-JPX slot alternate the
            # per-tile rate-allocation profile (tile-part-header QCD
            # overrides on the odd tiles)
            codec = "jpxtile"
        if (
            codec in ("jpx", "jpxcoc", "jpx97", "jpxtile", "jbig2s",
                      "jbig2hufstd", "jbig2hufalt")
            and doc_class == "mega_pdf"
        ):
            codec = "jpeg"
        for page in pages:
            page.codec = codec

    # Every third doc ships in the PDF 1.5 container (object stream +
    # xref stream) so both parser paths are exercised end-to-end by the
    # same corpus; page content — and therefore spans — is identical.
    encrypt: "bool | str" = False
    pdf15 = doc_id % 3 == 1
    if encrypt_every and doc_id % encrypt_every == 0:
        # cycle handler x container so all eight combinations appear
        # (encrypted doc_ids are multiples of encrypt_every, which can
        # never hit the doc_id % 3 == 1 stride above)
        k = doc_id // encrypt_every
        encrypt = (True, "aes", "aes256", "pubkey")[k % 4]
        pdf15 = (k // 4) % 2 == 1
    # cycle the three Type0 shapes (Identity-H + /ToUnicode, embedded
    # CMap stream with a mixed 1/2-byte codespace, predefined
    # /UniJIS-UCS2-H with NO /ToUnicode) so every font-decoding branch
    # is exercised end-to-end under span equality
    cid_font: "bool | str" = False
    if cid_every and doc_id % cid_every == 0:
        cid_font = (True, "embedded", "ucs2")[(doc_id // cid_every) % 3]
    return {
        "doc_id": f"doc{doc_id:06d}",
        "pdf_bytes": write_pdf(pages, pdf15=pdf15, encrypt=encrypt,
                               cid_font=cid_font),
        "n_pages": len(pages),
        "doc_class": doc_class,
    }


def iter_corpus(
    n_docs: int, seed: int = 42, mega_every: int = 50, profile: str = "scan",
    jpeg_every: int = 0, encrypt_every: int = 0, cid_every: int = 0,
) -> Iterator[dict[str, Any]]:
    for doc_id in range(n_docs):
        yield make_document(doc_id, seed=seed, mega_every=mega_every, profile=profile,
                            jpeg_every=jpeg_every, encrypt_every=encrypt_every,
                            cid_every=cid_every)


def document_from_text(doc_id: int, text: str) -> dict[str, Any]:
    """Deterministically wrap arbitrary text into a fixture PDF (used by
    the driver-contract flagship: testdata documents -> PDFs -> spans).

    Layout varies by doc_id so the whole kernel surface is exercised:
    every 5th doc is a spread page, every 7th is stored rotated, and
    every doc with doc_id % 6 == 2 ships its text through a Type0
    /Identity-H font + /ToUnicode CMap (spans are unchanged — the
    font-decoding layer recovers the exact original text).
    """

    rng = np.random.default_rng([97, doc_id])
    words = text.split()
    per_page = 40
    pages: list[PageSpec] = []
    page_no = 0
    for start in range(0, max(len(words), 1), per_page):
        chunk_words = words[start : start + per_page]
        lines = [" ".join(chunk_words[i : i + 8]) for i in range(0, len(chunk_words), 8)]
        if (doc_id + page_no) % 5 == 0:
            raster = _spread_raster(rng, _PROFILE["scan"]["spread"], tiled=False)
            items = [
                ("text", line, 100 + 80 * i, 120 if i % 2 == 0 else 940)
                for i, line in enumerate(lines[:7])
            ]
            pages.append(PageSpec(raster=raster, items=items))
        else:
            h, w = _PROFILE["scan"]["portrait"]
            raster = _portrait_raster(rng, h, w, tiled=False)
            items = [("text", line, 60 + 80 * i, 40) for i, line in enumerate(lines[:8])]
            upright = PageSpec(raster=raster, items=items)
            if (doc_id + page_no) % 7 == 0:
                rotate = (90, 180, 270)[(doc_id + page_no) % 3]
                pages.append(_inverse_rotate_page(upright, rotate))
            else:
                pages.append(upright)
        page_no += 1
    return {
        "doc_id": f"doc{doc_id:06d}",
        "pdf_bytes": write_pdf(pages, cid_font=doc_id % 6 == 2),
        "n_pages": len(pages),
    }
