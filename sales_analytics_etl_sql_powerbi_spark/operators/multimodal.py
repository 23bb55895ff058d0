"""Multimodal column plumbing (beyond-reference).

Treats image/audio/video payloads as opaque ``binary`` columns with a
typed metadata struct, and runs decode / feature-extraction as
Arrow-batched ``mapInPandas`` — the Spark-side shape (schema,
partitioning, batch iteration, UDF signature) is real and tested; the
actual media decoding is STUBBED (no PIL/ffmpeg in this container):
``decode_stub`` computes deterministic features from the raw bytes and
raises ``NotImplementedError`` if a real codec is requested.

At scale: binary payloads ride the same parquet row groups; feature
extraction is embarrassingly parallel (mapInPandas, no shuffle), and
``spark.sql.files.maxPartitionBytes`` bounds per-task memory.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["attach_binary_payload", "extract_features", "FEATURE_SCHEMA", "MULTIMODAL_META_SQL"]

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("byte_checksum", T.LongType()),
    ]
)


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Opaque binary column + typed metadata struct.

    Real pipelines read image/audio bytes from object storage; here the
    payload is the utf-8 text (deterministic stand-in with the same
    Spark-side semantics: BinaryType column + metadata struct).
    """
    payload = F.encode(F.col("text"), "UTF-8")
    meta = F.struct(
        F.length(payload).cast("long").alias("n_bytes"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
    )
    return docs.select("doc_id", payload.alias("payload"), meta.alias("meta"))


def decode_stub(payload: bytes, codec: str = "raw") -> dict:
    """Deterministic fake 'decode'. A real build plugs PIL/soundfile/
    pyav here; those libs are absent, so any non-raw codec raises."""
    if codec != "raw":
        raise NotImplementedError(
            f"media codec {codec!r} unavailable in this environment; "
            "only the 'raw' byte-feature stub is implemented"
        )
    return {
        "n_bytes": len(payload),
        "first_byte": payload[0] if payload else None,
        "byte_checksum": sum(payload) % 1_000_003,
    }


def extract_features(with_payload: DataFrame, codec: str = "raw") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: each Arrow batch of payload bytes is decoded in one
    Python call — the production shape for CPU-bound media work
    (swap ``decode_stub`` for a real decoder; partitioning, schema and
    batch iteration stay identical).
    """
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = [decode_stub(b, codec) for b in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out[["doc_id", "n_bytes", "first_byte", "byte_checksum"]]

    return with_payload.mapInPandas(run, schema=FEATURE_SCHEMA)


#: DuckDB twin of attach_binary_payload→extract_features over documents
#: (payload == utf-8 text bytes). Byte values come from the hex encoding
#: of the UTF-8 blob — ord(substring(...)) would give Unicode CODE
#: POINTS and character (not byte) positions, silently diverging from
#: the Python byte checksum on any non-ASCII text.
MULTIMODAL_META_SQL = """
SELECT doc_id,
  cast(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  CASE WHEN octet_length(encode(text)) > 0
       THEN cast(('0x' || substring(to_hex(encode(text)), 1, 2)) AS INT) END
    AS first_byte,
  cast(coalesce(list_sum(list_transform(
         range(1, octet_length(encode(text)) + 1),
         i -> cast(('0x' || substring(to_hex(encode(text)), 2*i - 1, 2)) AS INT))),
       0) % 1000003 AS BIGINT) AS byte_checksum
FROM documents
"""
