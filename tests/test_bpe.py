"""BPE tokenizer training: Spark-vs-pure-Python parity, determinism,
encoding semantics, early stop."""

import pytest
from pyspark.sql import functions as F

from sales_analytics_etl_sql_powerbi_spark.operators import bpe


def _docs(spark):
    return spark.createDataFrame(
        [(1, "low lower lowest low low"), (2, "new newer newest new lower")],
        "doc_id long, text string",
    )


def test_bpe_train_matches_python_reference(spark):
    """The scd2-style cross-implementation witness: the distributed
    trainer and a pure-Python reference produce the IDENTICAL ordered
    merge list (same argmax, same lexicographic tie-break, same
    greedy left-to-right application)."""
    m = bpe.bpe_train(_docs(spark), n_merges=12)
    wc = {"low": 3, "lower": 2, "lowest": 1, "new": 2, "newer": 1, "newest": 1}
    assert m == bpe.bpe_train_py(wc, n_merges=12)
    assert m[:2] == [("l", "o"), ("lo", "w")]  # the textbook first merges


def test_bpe_train_deterministic_across_runs(spark):
    docs = _docs(spark)
    assert bpe.bpe_train(docs, n_merges=8) == bpe.bpe_train(docs, n_merges=8)


def test_bpe_train_early_stop_on_min_pair_count(spark):
    """Once no pair reaches min_pair_count, training stops before
    n_merges — a corpus of all-distinct characters learns nothing at
    min_pair_count above its repetition level."""
    docs = spark.createDataFrame([(1, "ab cd ef")], "doc_id long, text string")
    assert bpe.bpe_train(docs, n_merges=10, min_pair_count=3) == []
    with pytest.raises(ValueError):
        bpe.bpe_train(docs, n_merges=0)


def test_bpe_encode_full_words_and_subword_splits(spark):
    """Frequent words collapse to single tokens; rarer words split at
    learned boundaries; concatenating subwords (minus the end marker)
    reconstructs every original token."""
    docs = _docs(spark)
    merges = bpe.bpe_train(docs, n_merges=10)
    rows = bpe.bpe_encode(docs, merges).collect()
    by_tok = {}
    for r in rows:
        by_tok[r.token] = r.subwords
        joined = "".join(r.subwords).replace("▁", "")
        assert joined == r.token  # lossless reconstruction
        assert r.n_subwords == len(r.subwords)
    assert by_tok["low"] == ["low▁"]
    assert by_tok["lower"] == ["low", "er▁"]


def test_bpe_encode_corpus_join_shape(spark):
    """The corpus side pays one tokenize + one equi-join: no window,
    no cartesian, merge count does not touch the corpus plan."""
    docs = _docs(spark)
    merges = bpe.bpe_train(docs, n_merges=6)
    plan = (
        bpe.bpe_encode(docs, merges)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan and "CartesianProduct" not in plan
