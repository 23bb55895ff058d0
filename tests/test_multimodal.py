"""Multimodal binary-column plumbing (decode stub + mapInPandas)."""

import pytest

from sales_analytics_etl_sql_powerbi_spark.operators import multimodal

DOCS = "doc_id long, text string"


def test_attach_payload_schema(spark):
    df = spark.createDataFrame([(1, "abc")], DOCS)
    out = multimodal.attach_binary_payload(df)
    assert [f.name for f in out.schema.fields] == ["doc_id", "payload", "meta"]
    r = out.first()
    assert bytes(r.payload) == b"abc"
    assert r.meta.n_bytes == 3
    assert r.meta.mime == "application/octet-stream"


def test_extract_features_values(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "")], DOCS)
    feats = {
        r.doc_id: r
        for r in multimodal.extract_features(
            multimodal.attach_binary_payload(df)
        ).collect()
    }
    assert feats[1].n_bytes == 3
    assert feats[1].first_byte == ord("a")
    assert feats[1].byte_checksum == (ord("a") + ord("b") + ord("c")) % 1_000_003
    assert feats[2].n_bytes == 0
    assert feats[2].first_byte is None


def test_non_raw_codec_raises():
    with pytest.raises(NotImplementedError, match="codec"):
        multimodal.decode_stub(b"xx", codec="jpeg")


def test_sql_twin_byte_parity_non_ascii():
    """The DuckDB twin must checksum UTF-8 BYTES, not code points."""
    import duckdb

    rows = [(1, "café ✓"), (2, ""), (3, "plain ascii")]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(multimodal.MULTIMODAL_META_SQL).fetchall()
    }
    for doc_id, text in rows:
        b = text.encode("utf-8")
        want = multimodal.decode_stub(b)
        assert got[doc_id] == (want["n_bytes"], want["first_byte"], want["byte_checksum"])
