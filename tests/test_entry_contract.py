"""Driver-contract seams that need no SparkSession.

The driver runs ``queries()`` vs ``oracle_sql()`` at sf0.01; local
sweeps (scripts/check_correctness.py) run them at any SF. Oracle twins
that carry side-inputs trained FROM the corpus (CSV export fixture,
IVF codebook, auto-sized LSH planes) must derive them from the same
corpus being swept — ``SPARK_GRAFT_ORACLE_SF_DIR`` is that seam. The
round-5 sf0.1 sweep caught exactly this: an sf0.01-pinned codebook
hash-mismatching against sf0.1 data.
"""

import __spark_entry__ as E
from sales_analytics_etl_sql_powerbi_spark.operators import similarity


def test_oracle_sf_dir_defaults_to_driver_scale(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_ORACLE_SF_DIR", raising=False)
    assert E._oracle_sf_dir().endswith("sf0.01")


def test_oracle_sf_dir_follows_env(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.1")
    assert E._oracle_sf_dir() == "/root/testdata/sf0.1"


def test_ivf_oracle_codebook_derives_from_sf_dir():
    """Different corpora must train different codebook literals — if the
    two strings matched, the sf_dir seam would be dead code and the
    sweep would silently replay one scale's constants at another."""
    s001 = similarity.ann_ivf_topk_sql(sf_dir="/root/testdata/sf0.01")
    s01 = similarity.ann_ivf_topk_sql(sf_dir="/root/testdata/sf0.1")
    assert s001 != s01
