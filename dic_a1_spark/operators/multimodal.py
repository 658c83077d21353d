"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic arithmetic fake; the real path raises NotImplementedError
behind an import-try). Everything Spark-side is real and tested: binary
columns, Arrow-batched mapInPandas with an explicit output schema, batch
iteration, and metadata extraction — swap `_fake_decode` for a PIL/ffmpeg
call and the plan is production-shaped.

The `documents.text` bytes stand in for media payloads (encode -> BLOB).
Because the stub is pure arithmetic on byte length and content hash, even
the pandas-UDF path carries a DuckDB oracle — the Arrow plumbing itself is
correctness-gated, not just smoke-tested.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dic_a1_spark.sources.readers import load_table

try:  # real decoders are not shipped in this environment
    import PIL.Image  # noqa: F401

    _HAVE_CODECS = True
except ImportError:
    _HAVE_CODECS = False

DECODE_SCHEMA = (
    "doc_id bigint, byte_len int, width int, height int, n_frames int, mode string"
)


def _fake_decode(byte_len: int) -> tuple[int, int, int]:
    """Deterministic stand-in for a real media decode: pretend the payload
    is a (width x height x frames) asset derived from its size."""
    width = byte_len % 640 + 16
    height = (byte_len * 7) % 480 + 16
    n_frames = byte_len % 24 + 1
    return width, height, n_frames


def real_decode(payload: bytes):  # pragma: no cover - env has no codecs
    """The production decode hook. Wire PIL/ffmpeg here when available."""
    if not _HAVE_CODECS:
        raise NotImplementedError(
            "media codecs unavailable in this environment; _fake_decode is "
            "used for plumbing tests"
        )
    raise NotImplementedError("real decoder not wired yet")


def with_blob(docs: DataFrame) -> DataFrame:
    """Attach the opaque payload column (binary) + cheap metadata."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.octet_length(F.encode("text", "UTF-8")).alias("byte_len"),
        F.sha2(F.encode("text", "UTF-8"), 256).alias("content_sha256"),
    )


def decode_batches(blobs: DataFrame) -> DataFrame:
    """Arrow-batched decode over mapInPandas: one Python process per
    partition, pandas batches in/out, fixed output schema. The batch shape
    (not row-at-a-time) is what makes this viable at scale — the stub does
    trivial math but the transfer pattern is the real one."""

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            # A NULL payload (absent asset) decodes to NULL metadata —
            # the oracle's octet_length(encode(NULL)) is NULL; len(None)
            # in the worker was a hard crash (r9 NULL-corpus sweep).
            # Nullable Int32 (not int32): NaN survives the Arrow trip as
            # a proper SQL NULL.
            lens = pdf["payload"].map(
                lambda b: len(b) if b is not None else None
            )
            trip = [
                _fake_decode(int(n)) if pd.notna(n) else (None, None, None)
                for n in lens
            ]
            w, h, nf = zip(*trip) if len(pdf) else ((), (), ())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": lens.astype("Int32"),
                    "width": pd.Series(w, index=pdf.index, dtype="Int32"),
                    "height": pd.Series(h, index=pdf.index, dtype="Int32"),
                    "n_frames": pd.Series(nf, index=pdf.index, dtype="Int32"),
                    "mode": pd.Series("stub", index=pdf.index, dtype="object"),
                }
            )

    return blobs.select("doc_id", "payload").mapInPandas(decode, DECODE_SCHEMA)


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload metadata — pure JVM expressions (no Python)."""
    return with_blob(load_table(spark, sf_dir, "documents")).drop("payload")


def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Arrow round-trip: binary -> mapInPandas decode -> typed
    metadata frame. Oracle-checked because the stub is deterministic."""
    return decode_batches(with_blob(load_table(spark, sf_dir, "documents")))


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plan over decoded metadata: pick every 8th frame
    index per asset — sequence explode, bounded per row, map-only."""
    dec = multimodal_decode_stub(spark, sf_dir)
    return dec.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(8))).alias(
            "frame_idx"
        ),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "multimodal_meta": multimodal_meta,
    "multimodal_decode_stub": multimodal_decode_stub,
    "multimodal_frame_sample": multimodal_frame_sample,
}

ORACLES: dict[str, str] = {
    "multimodal_meta": """
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
               sha256(text) AS content_sha256
        FROM documents
    """,
    "multimodal_decode_stub": """
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
               CAST(octet_length(encode(text)) % 640 + 16 AS INTEGER) AS width,
               CAST((octet_length(encode(text)) * 7) % 480 + 16 AS INTEGER) AS height,
               CAST(octet_length(encode(text)) % 24 + 1 AS INTEGER) AS n_frames,
               'stub' AS mode
        FROM documents
    """,
    "multimodal_frame_sample": """
        SELECT doc_id, CAST(unnest(range(0, octet_length(encode(text)) % 24 + 1, 8))
                   AS INTEGER) AS frame_idx
        FROM documents
    """,
}
