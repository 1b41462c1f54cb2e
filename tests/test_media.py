"""Media sink: PNG codec round-trips, content-addressed blob store,
resume idempotence, debug overlays, and run-metadata completeness."""

from __future__ import annotations

import json
import struct
import zlib

import numpy as np
import pytest

from pdf_toolkit_spark.corpus import corpus_config, make_document
from pdf_toolkit_spark.extract import extract_document
from pdf_toolkit_spark.pdfio.png import decode_gray_png, decode_png, encode_gray_png
from pdf_toolkit_spark.spark.input import corpus_dataframe
from pdf_toolkit_spark.spark.job import read_lineage, read_metrics, run_extraction

CFG = dict(corpus_config(), pages_per_chunk=32)


def test_png_roundtrip_filter0():
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(37, 61), dtype=np.uint8)
    png = encode_gray_png(arr)
    assert png.startswith(b"\x89PNG\r\n\x1a\n")
    got = decode_gray_png(png)
    assert np.array_equal(got, arr)


def _png_with_filters(arr: np.ndarray, ftypes: list[int]) -> bytes:
    """Hand-build a PNG whose row y uses filter ftypes[y] — exercises
    the decoder's filter reconstruction paths the encoder never emits."""

    h, w = arr.shape

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    raw = bytearray()
    prior = np.zeros(w, dtype=np.int32)
    for y in range(h):
        line = arr[y].astype(np.int32)
        ft = ftypes[y]
        raw.append(ft)
        if ft == 0:
            raw.extend((line & 0xFF).astype(np.uint8).tobytes())
        elif ft == 1:  # Sub
            left = np.concatenate(([0], line[:-1]))
            raw.extend(((line - left) & 0xFF).astype(np.uint8).tobytes())
        elif ft == 2:  # Up
            raw.extend(((line - prior) & 0xFF).astype(np.uint8).tobytes())
        else:
            raise AssertionError("test builds filters 0-2 only")
        prior = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))


def test_png_decoder_handles_sub_and_up_filters():
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, size=(6, 9), dtype=np.uint8)
    png = _png_with_filters(arr, [0, 1, 2, 1, 2, 0])
    assert np.array_equal(decode_gray_png(png), arr)


def test_png_rejects_non_gray():
    with pytest.raises(ValueError):
        encode_gray_png(np.zeros((4, 4, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_gray_png(b"not a png")


@pytest.fixture(scope="module")
def media_run(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("media_out"))
    docs = corpus_dataframe(spark, 8, seed=42, mega_every=4)
    result = run_extraction(spark, docs, CFG, out_dir=out, run_id="m1",
                            command="pytest media_run")
    return out, result


def test_every_span_media_ref_resolves_to_exact_bytes(spark, media_run):
    """The round-1 gap: spans used to carry dangling media_refs. Now a
    reader can fetch every image span's PNG from the media table and it
    decodes to the exact region raster the serial extractor produces."""

    out, _ = media_run
    media = {
        r["media_ref"]: bytes(r["png_bytes"])
        for r in spark.read.parquet(f"{out}/media").collect()
    }
    spans_rows = spark.read.parquet(f"{out}/spans").collect()
    n_image_spans = 0
    serial_media: dict[str, bytes] = {}
    for doc_id in range(8):
        doc = make_document(doc_id, seed=42, mega_every=4)
        serial_media.update(extract_document(doc["pdf_bytes"], CFG)["media"])
    for row in spans_rows:
        for s in row["spans"]:
            if s["kind"] != "image":
                continue
            n_image_spans += 1
            assert s["media_ref"] in media, f"dangling media_ref {s['media_ref']}"
            assert media[s["media_ref"]] == serial_media[s["media_ref"]]
    assert n_image_spans > 0
    # and the blobs decode to rasters whose content-hash is the ref
    from pdf_toolkit_spark.extract import media_ref_for

    some = sorted(media)[:5]
    for ref in some:
        arr = decode_png(media[ref])  # corpus media includes RGB blobs
        assert media_ref_for(arr) == ref


def test_media_refs_are_unique_and_resume_does_not_rewrite(spark, media_run):
    out, _ = media_run
    tbl = spark.read.parquet(f"{out}/media")
    n_before = tbl.count()
    assert tbl.select("media_ref").distinct().count() == n_before

    # Resume over a superset: only new docs' new blobs are appended,
    # existing refs are never rewritten (content-addressed idempotence).
    superset = corpus_dataframe(spark, 10, seed=42, mega_every=4)
    run_extraction(spark, superset, CFG, out_dir=out, run_id="m2")
    tbl2 = spark.read.parquet(f"{out}/media")
    assert tbl2.select("media_ref").distinct().count() == tbl2.count()


def test_metrics_carry_timestamps_and_command(spark, media_run):
    out, result = media_run
    m = read_metrics(spark, out).filter("run_id = 'm1'").collect()[0]
    assert m["command"] == "pytest media_run"
    assert m["started_at"] <= m["ended_at"]  # ISO-8601 strings sort
    assert result.metrics["started_at"] == m["started_at"]
    lineage = read_lineage(spark, out)
    assert "recorded_at" in lineage.columns
    assert lineage.filter("recorded_at IS NULL").count() == 0


def test_debug_overlay_emitted_and_resolvable(spark, tmp_path):
    out = str(tmp_path / "dbg")
    docs = corpus_dataframe(spark, 4, seed=42, mega_every=0)
    cfg = dict(CFG, debug=True)
    run_extraction(spark, docs, cfg, out_dir=out, run_id="d1")
    media = {
        r["media_ref"]: bytes(r["png_bytes"])
        for r in spark.read.parquet(f"{out}/media").collect()
    }
    lineage = spark.read.parquet(f"{out}/lineage").collect()
    debug_refs = []
    for row in lineage:
        detail = json.loads(row["detail_json"])
        if detail.get("debug_ref"):
            debug_refs.append(detail["debug_ref"])
    assert debug_refs, "debug mode emitted no overlays"
    for ref in debug_refs:
        assert ref in media
        decode_gray_png(media[ref])  # valid grayscale PNG


def test_persist_media_off_writes_no_media_rows(spark, tmp_path):
    out = str(tmp_path / "nomedia")
    docs = corpus_dataframe(spark, 3, seed=42, mega_every=0)
    run_extraction(spark, docs, dict(CFG, persist_media=False), out_dir=out, run_id="n1")
    import os

    assert not os.path.exists(f"{out}/media")
    # spans still carry refs (content addresses are computed either way)
    spans = spark.read.parquet(f"{out}/spans").collect()
    kinds = {s["kind"] for r in spans for s in r["spans"]}
    assert "image" in kinds
