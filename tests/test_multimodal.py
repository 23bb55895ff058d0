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


def test_resize_strided_bytes_and_codec_gate(spark):
    from sales_analytics_etl_sql_powerbi_spark.operators import multimodal as M

    docs = spark.createDataFrame(
        [(1, "x" * 200, "en"), (2, "", "en"), (3, None, "en")],
        "doc_id long, text string, lang string",
    )
    out = M.resize_images(M.attach_binary_payload(docs), width=4, height=4)
    rows = {r.doc_id: r for r in out.collect()}
    # 200 bytes → stride 12 → ceil(200/12)=17 capped at 16
    assert rows[1].n_bytes == 16 and (rows[1].width, rows[1].height) == (4, 4)
    assert bytes(rows[1].payload) == ("x" * 200).encode()[::12][:16]
    assert 2 not in rows and 3 not in rows  # empty/NULL payloads drop
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        M.resize_stub(b"abc", 2, 2, codec="jpeg")


def test_sample_frames_expands_rows(spark):
    from sales_analytics_etl_sql_powerbi_spark.operators import multimodal as M

    # 300 bytes, 64-byte frames → frames 0..4; every 2nd → 0,2,4; cap 3
    docs = spark.createDataFrame(
        [(7, "a" * 300, "en")], "doc_id long, text string, lang string"
    )
    rows = M.sample_frames(M.attach_binary_payload(docs)).collect()
    assert [(r.frame_id, r.n_frame_bytes) for r in rows] == [
        (0, 64), (2, 64), (4, 44),
    ]
    assert all(r.frame_checksum == (ord("a") * r.n_frame_bytes) % 1_000_003 for r in rows)
