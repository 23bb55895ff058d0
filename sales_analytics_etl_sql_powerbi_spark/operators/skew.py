"""Skew-mitigation join utilities.

AQE's skew-join splitting (on in session.get_spark) handles most skew
at runtime; explicit salting is the tool for the residual case — a
shuffle join where one key dominates (the reference's own data is this
shape: Amazon ≈ 56% of units, FL ≈ 10%; reference README.md:152-158)
and the small side is too big to broadcast outright.

``salted_join``: the skewed (large) side gets a deterministic salt in
``[0, salt)`` derived from row identity; the small side is replicated
``salt`` times; the join key becomes (key, salt). Each hot key's rows
spread over ``salt`` shuffle partitions instead of one straggler task.
Result is row-identical to the unsalted join (inner/left equi-join
semantics preserved; replication side has no duplicate keys added
because each replica carries a distinct salt value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt: int = 8,
    salt_col: str = "__salt",
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Equi-join with the large side salted and the small side replicated.

    ``on`` key column(s) must exist on both sides. The salt on the large
    side is ``pmod(hash(salt_on or all large columns), salt)`` —
    deterministic (no rand(): salts recompute identically on task retry,
    which rand()-salting cannot guarantee mid-shuffle). LIMITATION:
    rows fully identical on the salted columns share one salt, so a hot
    key made of verbatim-duplicate rows is not spread — pass
    ``salt_on=[<a high-entropy column>]`` (event id, line number…), or
    pre-aggregate the duplicates first (cheaper than the join anyway).
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        # right/full outer would surface each unmatched small-side row
        # once PER REPLICA (salt copies) — row identity only holds when
        # unmatched rows can come from the un-replicated side
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    entropy = salt_on if salt_on else large.columns
    lg = large.withColumn(
        salt_col, F.pmod(F.hash(*[F.col(c) for c in entropy]), F.lit(salt))
    )
    sm = small.withColumn(
        salt_col, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = lg.join(sm, on=keys + [salt_col], how=how)
    return out.drop(salt_col)
