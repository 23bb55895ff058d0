"""Text-analysis operators: stats, token counts, lang-id, fingerprints."""

from sales_analytics_etl_sql_powerbi_spark.operators import text

DOCS = "doc_id long, text string, lang string"


def test_text_stats_values(spark):
    df = spark.createDataFrame([(1, "the cat the cat runs", "en")], DOCS)
    r = text.text_stats(df).first()
    assert r.n_chars == 20
    assert r.n_tokens == 5
    assert r.n_unique_tokens == 3
    assert abs(r.avg_token_len - 16 / 5) < 1e-12
    assert abs(r.stopword_ratio - 2 / 5) < 1e-12  # 'the' x2
    assert abs(r.ttr - 3 / 5) < 1e-12


def test_token_count_bpe(spark):
    df = spark.createDataFrame([(1, "hello world42!", "en")], DOCS)
    r = text.token_count_bpe(df).first()
    # hello | world | 42 | !
    assert r.n_bpe_tokens == 4
    assert r.n_ws_tokens == 2


def test_lang_id_winner_and_tiebreak(spark):
    df = spark.createDataFrame(
        [
            (1, "der hund und die katze", "de"),
            (2, "the cat and the dog", "en"),
            (3, "zzz qqq www", "xx"),  # no markers: tie -> first lang asc
        ],
        DOCS,
    )
    got = {r.doc_id: (r.predicted_lang, r.marker_hits) for r in text.lang_id(df).collect()}
    assert got[1] == ("de", 3)  # der, und, die
    assert got[2][0] == "en"
    assert got[3] == ("de", 0)  # deterministic tie-break: first of sorted langs


def test_doc_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma", "en"), (2, "gamma alpha beta", "en")], DOCS
    )
    rows = {r.doc_id: r for r in text.doc_fingerprint(df).collect()}
    assert rows[1].fingerprint == rows[2].fingerprint  # same token set
    assert rows[1].exact_hash != rows[2].exact_hash  # different raw text


def test_quality_filter_thresholds(spark):
    df = spark.createDataFrame(
        [
            (1, "unique interesting varied vocabulary sentence here", "en"),
            (2, "the the the the the the the the the the", "en"),  # stopword spam
            (3, "too short", "en"),  # < 5 tokens
        ],
        DOCS,
    )
    kept = {r.doc_id for r in text.quality_filter(df).collect()}
    assert kept == {1}


def test_corpus_clean_dedups_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "unique interesting varied vocabulary sentence here", "en"),
            (2, "unique interesting varied vocabulary sentence here", "en"),  # dup of 1
            (3, "ein anderer ordentlich langer deutscher satz hier", "de"),
            (4, "too short", "en"),  # filtered
        ],
        DOCS,
    )
    got = {r.lang: r.n_docs for r in text.corpus_clean(df).collect()}
    assert got == {"en": 1, "de": 1}
