"""Approximate frequent items (Misra-Gries) — bounded-memory top-k.

``vocab_topk`` (operators/text.py) is exact: it shuffles EVERY
distinct token. At 100 TB the token vocabulary (URLs, ids, typos) can
itself be corpus-scale, making the exact groupBy the bottleneck. This
module is the classic streaming answer: **per-partition Misra-Gries
summaries** — at most ``capacity`` counters per partition however big
the partition — merged by a tiny shuffle of
``partitions × capacity`` rows.

Guarantees (the textbook MG bounds, surfaced as columns, unit-pinned)
— stated for the MERGED SUMMARY, i.e. before the final top-k cut:

- every token with true frequency > N/(capacity+1) is PRESENT in the
  merged summary; a finite ``topk`` then keeps the k largest by
  ``count_min``, so if MORE than k tokens clear the threshold the cut
  can drop guaranteed-present ones — pass ``topk=None`` to get the
  whole summary when the downstream consumer needs the presence
  guarantee itself;
- per reported token, ``count_min ≤ true ≤ count_max`` where
  ``count_max − count_min`` is the summed per-partition decrement
  (≤ N/(capacity+1) overall) — the caller sees the interval, not a
  point estimate pretending to be exact.

Python (Arrow-batched ``mapInPandas``) is justified here: MG is
inherently stateful per partition — no Column expression can hold a
bounded counter dict across rows. The per-batch work is a vectorized
``value_counts`` + dict merge.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["frequent_tokens_approx", "misra_gries_update"]

_MG_SCHEMA = T.StructType(
    [
        T.StructField("token", T.StringType()),
        T.StructField("est", T.LongType()),
        T.StructField("dec", T.LongType()),
    ]
)


def misra_gries_update(
    counters: dict[str, int], token: str, cnt: int, capacity: int
) -> int:
    """Add ``cnt`` occurrences of ``token``; returns the decrement
    applied (0 if none). Batched Misra-Gries: on overflow, subtract
    the minimum counter from ALL counters and drop zeros — the
    amortized total decrement is ≤ N/(capacity+1)."""
    if token in counters:
        counters[token] += cnt
        return 0
    counters[token] = cnt
    if len(counters) <= capacity:
        return 0
    d = min(counters.values())
    for t in list(counters):
        counters[t] -= d
        if counters[t] <= 0:
            del counters[t]
    return d


def frequent_tokens_approx(
    docs: DataFrame, topk: int | None = 50, capacity: int = 1000
) -> DataFrame:
    """Top-k tokens by approximate frequency, one bounded-memory pass.

    Output: (token, count_min, count_max) ordered by count_min desc,
    token asc — true count ∈ [count_min, count_max]. ``capacity``
    bounds per-task memory AND the error: interval width ≤
    N/(capacity+1). ``topk=None`` returns the full merged summary
    (≤ partitions×capacity tokens) — the form that carries the
    heavy-hitter presence guarantee; a finite ``topk`` ranks by
    ``count_min`` (an underestimate), which is a display convenience,
    not part of the guarantee.

    Determinism contract: the INTERVAL guarantee is unconditional, but
    the point values (and hence near-tie rankings) depend on encounter
    order within partitions — like every streaming summary, compare
    against the bounds, not for equality across runs/partitionings.
    """
    import pandas as pd

    from .text import exploded_tokens

    toks = exploded_tokens(docs).select("token")

    def mg(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        counters: dict[str, int] = {}
        dec_total = 0
        for pdf in batches:
            for token, cnt in pdf["token"].value_counts().items():
                dec_total += misra_gries_update(
                    counters, token, int(cnt), capacity
                )
        out = pd.DataFrame(
            {
                "token": list(counters.keys()),
                "est": [int(v) for v in counters.values()],
                "dec": [0] * len(counters),
            }
        )
        # one summary row carries this partition's total decrement so
        # the merge can compute the global error interval
        marker = pd.DataFrame({"token": [None], "est": [0], "dec": [dec_total]})
        yield pd.concat([out, marker], ignore_index=True)

    # materialize the summaries ONCE: the error aggregate and the
    # per-token merge both consume them, and MG point values are
    # encounter-order-dependent — two lazy executions could pair an
    # error bound from one run with counts from another, voiding the
    # interval guarantee (and re-scanning the corpus). The checkpoint
    # is partitions×(capacity+1) rows — tiny by construction.
    summaries = toks.mapInPandas(mg, schema=_MG_SCHEMA).localCheckpoint(
        eager=True
    )
    err = summaries.agg(F.sum("dec").cast("long").alias("__err"))
    out = (
        summaries.where(F.col("token").isNotNull())
        .groupBy("token")
        .agg(F.sum("est").cast("long").alias("count_min"))
        .crossJoin(F.broadcast(err))
        .select(
            "token",
            "count_min",
            (F.col("count_min") + F.col("__err")).alias("count_max"),
        )
        .orderBy(F.desc("count_min"), F.asc("token"))
    )
    return out.limit(topk) if topk is not None else out
