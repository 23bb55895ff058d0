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
