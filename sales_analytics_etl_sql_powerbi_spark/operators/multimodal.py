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

__all__ = [
    "attach_binary_payload",
    "extract_features",
    "resize_images",
    "sample_frames",
    "FEATURE_SCHEMA",
    "RESIZED_SCHEMA",
    "FRAME_SCHEMA",
    "MULTIMODAL_META_SQL",
    "RESIZE_SQL",
    "SAMPLE_FRAMES_SQL",
]

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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
    ]
)


def resize_stub(payload: bytes, width: int, height: int, codec: str = "raw") -> bytes:
    """Deterministic fake 'resize': strided byte downsample to ≤w·h
    bytes. A real build plugs PIL's ``Image.resize`` here — the Spark
    plumbing (batch shape, output schema, metadata update) is what this
    module pins; only this function changes."""
    if codec != "raw":
        raise NotImplementedError(
            f"media codec {codec!r} unavailable in this environment; "
            "only the 'raw' strided-byte stub is implemented"
        )
    target = width * height
    if not payload:
        return b""
    stride = max(len(payload) // target, 1)
    return payload[::stride][:target]


def resize_images(
    with_payload: DataFrame, width: int = 8, height: int = 8, codec: str = "raw"
) -> DataFrame:
    """Arrow-batched resize over binary payloads (mapInPandas).

    One Python call per Arrow batch, no shuffle — the embarrassingly
    parallel media shape. Output carries the resized payload plus the
    updated dimensions and a checksum (the oracle compares the scalar
    projection; binary equality is pinned by unit test).
    """
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                if b is None or len(b) == 0:  # mirrors the oracle's n>0 gate
                    continue
                rb = resize_stub(bytes(b), width, height, codec)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "payload": rb,
                        "n_bytes": len(rb),
                        "width": width,
                        "height": height,
                        "checksum": sum(rb) % 1_000_003,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "payload", "n_bytes", "width", "height", "checksum",
                ],
            )

    return with_payload.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_id", T.IntegerType()),
        T.StructField("n_frame_bytes", T.LongType()),
        T.StructField("frame_checksum", T.LongType()),
        # the frame BYTES as uppercase hex — puts the binary content
        # itself under the driver's value hash, like resize's payload_hex
        T.StructField("frame_hex", T.StringType()),
    ]
)


def sample_frames(
    with_payload: DataFrame,
    frame_bytes: int = 64,
    every_n: int = 2,
    max_frames: int = 3,
) -> DataFrame:
    """Frame sampling: one row per kept frame (row-EXPANDING mapInPandas).

    Treats the payload as a sequence of ``frame_bytes`` chunks (a fake
    video container), keeps every ``every_n``-th frame up to
    ``max_frames`` — the decode-side sampling a video pipeline does
    before feature extraction. Output cardinality is data-dependent
    (0..max_frames rows per doc): exactly the iterator shape
    ``mapInPandas`` exists for, where a scalar pandas_udf could not
    change the row count.
    """
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                if b is None:
                    continue
                b = bytes(b)
                frames = [
                    b[i : i + frame_bytes] for i in range(0, len(b), frame_bytes)
                ]
                for k, frame in enumerate(frames[::every_n][:max_frames]):
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_id": k * every_n,
                            "n_frame_bytes": len(frame),
                            "frame_checksum": sum(frame) % 1_000_003,
                            "frame_hex": frame.hex().upper(),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_id", "n_frame_bytes", "frame_checksum",
                    "frame_hex",
                ],
            )

    return with_payload.mapInPandas(run, schema=FRAME_SCHEMA)


#: byte at 1-based position {p} of the utf-8 blob's hex encoding
_BYTE_AT = "cast(('0x' || substring(__hex, 2*({p}) - 1, 2)) AS INT)"


def resize_sql(width: int = 8, height: int = 8) -> str:
    """DuckDB twin of resize_images: scalar projection PLUS the resized
    payload itself as uppercase hex (``payload_hex``) — the driver's
    hash thereby covers the output BYTES, not just dims+checksum
    (Spark's ``hex(binary)`` and the reassembled DuckDB hex pairs are
    both uppercase)."""
    target = width * height
    idx = f"1 + i * greatest(__n // {target}, 1)"
    picked = (
        f"list_transform(range(0, least({target}, "
        f"cast(ceil(__n / cast(greatest(__n // {target}, 1) AS DOUBLE)) AS BIGINT))), "
        f"i -> {_BYTE_AT.format(p=idx)})"
    )
    return f"""
SELECT doc_id,
       cast(len({picked}) AS BIGINT) AS n_bytes,
       {width} AS width, {height} AS height,
       cast(coalesce(list_sum({picked}), 0) % 1000003 AS BIGINT) AS checksum,
       array_to_string(list_transform({picked},
                                      b -> right('0' || to_hex(b), 2)), '')
         AS payload_hex
FROM (
  SELECT doc_id, octet_length(encode(text)) AS __n, to_hex(encode(text)) AS __hex
  FROM documents WHERE text IS NOT NULL AND octet_length(encode(text)) > 0
) b
"""


def sample_frames_sql(
    frame_bytes: int = 64, every_n: int = 2, max_frames: int = 3
) -> str:
    """DuckDB twin of sample_frames: frame grid → filter → byte math."""
    start = f"fid * {frame_bytes}"
    nfb = f"least({frame_bytes}, __n - {start})"
    checksum = (
        f"list_sum(list_transform(range(1, {nfb} + 1), "
        f"i -> {_BYTE_AT.format(p=f'{start} + i')}))"
    )
    return f"""
SELECT doc_id, cast(fid AS INT) AS frame_id,
       cast({nfb} AS BIGINT) AS n_frame_bytes,
       cast(coalesce({checksum}, 0) % 1000003 AS BIGINT) AS frame_checksum,
       substring(__hex, ({start}) * 2 + 1, ({nfb}) * 2) AS frame_hex
FROM (
  SELECT doc_id, __n, __hex,
         unnest(range(0, cast(ceil(__n / cast({frame_bytes} AS DOUBLE)) AS BIGINT))) AS fid
  FROM (SELECT doc_id, octet_length(encode(text)) AS __n, to_hex(encode(text)) AS __hex
        FROM documents WHERE text IS NOT NULL AND octet_length(encode(text)) > 0) b
) f
WHERE fid % {every_n} = 0 AND fid // {every_n} < {max_frames}
ORDER BY doc_id, frame_id
"""


RESIZE_SQL = resize_sql()
SAMPLE_FRAMES_SQL = sample_frames_sql()

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
