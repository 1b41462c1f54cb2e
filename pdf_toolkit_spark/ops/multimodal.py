"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

The decode kernels are STUBS (this container has no image/audio codecs)
— ``_fake_decode_header`` derives deterministic metadata from the bytes
instead of a real pixel decode, and raising paths are marked. The
Spark-side plumbing is real and what matters at scale: binary column
through Arrow batches, explicit output schema, small batch sizes,
content-addressed output refs. Swap ``_fake_decode_header`` for a PIL /
ffmpeg call and nothing else changes.

Because the stub is sha256-derived it IS SQL-expressible: both queries
carry exact DuckDB oracles (sha256(VARCHAR) hashes the same UTF-8
bytes), plus the local re-implementation check in tests/test_ops.py.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .common import table

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("n_bytes", T.IntegerType(), False),
    T.StructField("format", T.StringType(), False),
    T.StructField("width", T.IntegerType(), False),
    T.StructField("height", T.IntegerType(), False),
    T.StructField("thumb_ref", T.StringType(), False),
])


def fake_decode_header(payload: bytes) -> dict:
    """STUB decoder: deterministic pseudo-metadata from the payload.

    A real deployment decodes actual media here (PIL.Image.open /
    soundfile / pyav); those libraries are absent in this environment,
    so the 'decode' is a hash-derived fake with the same signature and
    cost shape. NotImplementedError marks the real-codec path.
    """

    if payload[:4] in (b"\x89PNG", b"RIFF", b"\xff\xd8\xff\xe0"):
        raise NotImplementedError("real media codecs are not available in this build")
    digest = hashlib.sha256(payload).digest()
    return {
        "format": ("img", "audio", "video")[digest[0] % 3],
        "width": 64 + digest[1],
        "height": 64 + digest[2],
        "thumb_ref": "sha256:" + digest.hex()[:16],
    }


def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Treat each document's text bytes as an opaque media payload and
    extract typed metadata via one mapInPandas stage."""

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {k: [] for k in ("doc_id", "n_bytes", "format", "width", "height", "thumb_ref")}
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                raw = bytes(payload)
                meta = fake_decode_header(raw)
                out["doc_id"].append(int(doc_id))
                out["n_bytes"].append(len(raw))
                for k in ("format", "width", "height", "thumb_ref"):
                    out[k].append(meta[k])
            yield pd.DataFrame(out)

    return docs.mapInPandas(decode, schema=MEDIA_META_SCHEMA)


def media_format_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downstream relational stage over UDF output (format histogram) —
    shows the metadata is a first-class column for Catalyst."""

    return (
        media_metadata(spark, sf_dir)
        .groupBy("format")
        .agg(F.count("*").alias("n_docs"), F.sum("n_bytes").alias("total_bytes"))
    )


QUERIES = {
    "mm_media_metadata": media_metadata,
    "mm_media_format_histogram": media_format_histogram,
}

#: Exact DuckDB oracles: the stub decoder is sha256-derived, and DuckDB
#: sha256(VARCHAR) hashes the UTF-8 bytes — exactly the payload the
#: Spark side encodes. (With a real codec these revert to rows-only
#: checks; the deterministic stub is what makes them SQL-expressible.)
_META_SQL = """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           CASE (('0x' || substr(sha256(text), 1, 2))::INT % 3)
                WHEN 0 THEN 'img' WHEN 1 THEN 'audio' ELSE 'video' END AS format,
           64 + ('0x' || substr(sha256(text), 3, 2))::INT AS width,
           64 + ('0x' || substr(sha256(text), 5, 2))::INT AS height,
           'sha256:' || substr(sha256(text), 1, 16) AS thumb_ref
    FROM documents
"""

ORACLES: dict[str, str] = {
    "mm_media_metadata": _META_SQL,
    "mm_media_format_histogram": f"""
        SELECT format, count(*) AS n_docs,
               CAST(sum(n_bytes) AS BIGINT) AS total_bytes
        FROM ({_META_SQL}) GROUP BY format
    """,
}
