"""Data-driven ordered-pass rules engine — SURVEY §2.8 F1–F3/F8–F9.

The reference's analytical core is product categorization done as
sequential T-SQL ``UPDATE … SET col = CASE … END WHERE guard`` passes
(reference sql/transformations/10_dim_product_category_rules.sql:19-102
and 30_dim_product_subcategory_rules_furniture.sql:20-123). The
semantics that must survive:

1. **Pass order is semantic** — pass 3 of 10_*.sql runs unguarded and
   can overwrite passes 1–2 (e.g. ``CN1139-%`` → Automotive overriding
   the ``CN%`` → Furniture prefix rule).
2. **First-match-wins inside a pass** — keyword overlap order matters:
   ``'%storage bench%'`` must be tested before ``'%storage%'``
   (reference 30_*.sql:99-100), ``'%bed frame%'`` before ``'%bed%'``.
3. **LIKE is case-insensitive** in SQL Server's default collation —
   every LIKE/`=` here lowers both sides.
4. A pass's ELSE is either *keep* (``ELSE p.category``), a literal
   (``ELSE 'Other'``), or SQL NULL (CASE with no ELSE).

Here a pass is a frozen dataclass and the engine compiles the pass
list BOTH ways:

- :func:`apply_passes` → one chained Catalyst ``when()`` projection per
  pass (constant-folded, whole-stage-codegen, zero Python in executors);
- :func:`passes_to_sql` → the equivalent chained-CTE ANSI SQL for the
  DuckDB correctness oracle.

The rule *content* of the reference scripts ships as data below
(REFERENCE_CATEGORY_PASSES / REFERENCE_SUBCATEGORY_PASSES) so a
reference user can run their exact categorization unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "When",
    "Guard",
    "RulePass",
    "KEEP",
    "apply_passes",
    "passes_to_sql",
    "REFERENCE_CATEGORY_PASSES",
    "REFERENCE_SUBCATEGORY_PASSES",
    "TESTDATA_CATEGORY_PASSES",
    "TESTDATA_SUBCATEGORY_PASSES",
]

#: Sentinel: pass's ELSE keeps the target column's current value.
KEEP = "__KEEP__"


@dataclass(frozen=True)
class When:
    """One CASE branch: ``WHEN any-of(preds) THEN value``.

    ``preds`` is a tuple of ``(column, op, operand)`` OR'd together;
    ``op`` ∈ {'like', 'eq'}. Matching is case-insensitive (SQL Server
    default collation — SURVEY §7 gotchas).
    """

    value: str
    preds: tuple[tuple[str, str, str], ...]


@dataclass(frozen=True)
class Guard:
    """WHERE clause of an UPDATE pass (all conjuncts AND'd)."""

    null: tuple[str, ...] = ()  # col IS NULL
    null_or_blank: tuple[str, ...] = ()  # col IS NULL OR LTRIM(RTRIM(col)) = ''
    eq: tuple[tuple[str, str], ...] = ()  # col = 'literal'


@dataclass(frozen=True)
class RulePass:
    """One ``UPDATE … SET target = CASE … END WHERE guard`` pass."""

    target: str
    whens: tuple[When, ...]
    guard: Guard | None = None
    else_: str | None = KEEP  # KEEP | literal | None (SQL NULL)
    description: str = ""


def _sq(s: str) -> str:
    return s.replace("'", "''")


def _pred_col(col: str, op: str, operand: str) -> Column:
    lowered = F.lower(F.col(col))
    if op == "like":
        return lowered.like(operand.lower())
    if op == "eq":
        return lowered == F.lit(operand.lower())
    raise ValueError(f"unknown rule op {op!r}")


def _pred_sql(col: str, op: str, operand: str) -> str:
    if op == "like":
        return f"lower({col}) LIKE '{_sq(operand.lower())}'"
    if op == "eq":
        return f"lower({col}) = '{_sq(operand.lower())}'"
    raise ValueError(f"unknown rule op {op!r}")


def _guard_empty(g: Guard) -> bool:
    return not (g.null or g.null_or_blank or g.eq)


def _guard_col(g: Guard) -> Column:
    if _guard_empty(g):  # empty Guard() ≡ unguarded (guard=None)
        return F.lit(True)
    conds: list[Column] = []
    conds += [F.col(c).isNull() for c in g.null]
    conds += [
        F.col(c).isNull() | (F.trim(F.col(c)) == F.lit("")) for c in g.null_or_blank
    ]
    # equality lowers both sides — SQL Server CI collation applies to
    # the UPDATE's WHERE guard exactly as to the CASE predicates
    conds += [F.lower(F.col(c)) == F.lit(v.lower()) for c, v in g.eq]
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def _guard_sql(g: Guard) -> str:
    if _guard_empty(g):
        return "TRUE"
    conds: list[str] = []
    conds += [f"{c} IS NULL" for c in g.null]
    # blank = spaces-only, exactly F.trim's ASCII-space semantics. NOT
    # trim(): bare trim() strips Unicode spaces in DuckDB (NBSP — the
    # r15 divergence), and the two-arg form flips argument order
    # between dialects (Spark trim(trimStr, str) vs DuckDB
    # trim(str, chars) — the fresh-seed rules fuzz caught the Spark
    # F.expr fast path silently mis-guarding on ''). replace() has
    # identical semantics in both dialects.
    conds += [
        f"({c} IS NULL OR replace({c}, ' ', '') = '')" for c in g.null_or_blank
    ]
    conds += [f"lower({c}) = '{_sq(v.lower())}'" for c, v in g.eq]
    return " AND ".join(conds)


def compile_pass(p: RulePass) -> Column:
    """Compile one pass to the Column expression for its target."""
    keep = F.col(p.target)
    case: Column | None = None
    for w in p.whens:
        cond = _pred_col(*w.preds[0])
        for pr in w.preds[1:]:
            cond = cond | _pred_col(*pr)
        case = (case.when if case is not None else F.when)(cond, F.lit(w.value))
    if p.else_ == KEEP:
        else_col = keep
    elif p.else_ is None:
        else_col = F.lit(None).cast("string")
    else:
        else_col = F.lit(p.else_)
    body = case.otherwise(else_col) if case is not None else else_col
    if p.guard is None:
        return body
    return F.when(_guard_col(p.guard), body).otherwise(keep)


def apply_passes(
    df: DataFrame,
    passes: list[RulePass] | tuple[RulePass, ...],
    compile_via_sql: bool = True,
) -> DataFrame:
    """Apply ordered passes; adds missing target columns as NULL string.

    Each pass is one projection — Catalyst collapses the chain into a
    single whole-stage-codegen stage over the scan; at 100 TB this adds
    zero extra passes over the data.

    ``compile_via_sql`` (default): each pass compiles to ONE SQL string
    handed to ``F.expr`` — a single py4j round-trip per pass. The
    Column path (``compile_via_sql=False``) builds the identical
    expression tree object-by-object, which for the reference content
    (~150 LIKE predicates × 8 passes) costs hundreds of driver↔JVM
    calls per plan build; measured ~2× slower plan construction at the
    same executed plan (the analyzed trees are equal, pinned by
    tests/test_rules.py). Both paths stay maintained because the fuzz
    test uses their independence as a compiler-equivalence witness.
    """
    for p in passes:
        if p.target not in df.columns:
            df = df.withColumn(p.target, F.lit(None).cast("string"))
        df = df.withColumn(
            p.target,
            F.expr(pass_expr_sql(p, null_type="STRING"))
            if compile_via_sql
            else compile_pass(p),
        )
    return df


def pass_expr_sql(p: RulePass, null_type: str = "VARCHAR") -> str:
    """The ANSI-SQL expression a pass assigns to its target column.

    ``null_type`` is the only dialect seam: DuckDB spells an untyped
    NULL string ``CAST(NULL AS VARCHAR)`` (the oracle default), Spark
    SQL wants ``STRING`` (the :func:`apply_passes` fast path). Every
    other token — ``lower``/``LIKE``/``trim``/``CASE`` — parses
    identically in both engines.
    """
    branches = []
    for w in p.whens:
        cond = " OR ".join(_pred_sql(*pr) for pr in w.preds)
        branches.append(f"WHEN ({cond}) THEN '{_sq(w.value)}'")
    if p.else_ == KEEP:
        else_sql = p.target
    elif p.else_ is None:
        else_sql = f"CAST(NULL AS {null_type})"
    else:
        else_sql = f"'{_sq(p.else_)}'"
    body = (
        f"CASE {' '.join(branches)} ELSE {else_sql} END" if branches else else_sql
    )
    if p.guard is None:
        return body
    return f"CASE WHEN {_guard_sql(p.guard)} THEN {body} ELSE {p.target} END"


def passes_to_sql(
    base_sql: str,
    passes: list[RulePass] | tuple[RulePass, ...],
    base_columns: list[str] | None = None,
) -> str:
    """Chained-CTE ANSI SQL equivalent of :func:`apply_passes`.

    ``base_sql`` is a SELECT producing the input rows; targets missing
    from ``base_columns`` (when given) are seeded as NULL. Output is a
    ``WITH``-chain where stage N rewrites stage N-1's target column —
    runnable verbatim in DuckDB for the oracle.
    """
    ctes = [f"__rp0 AS ({base_sql})"]
    seeded: set[str] = set(base_columns) if base_columns is not None else set()
    i = 0
    for p in passes:
        prev = f"__rp{i}"
        if base_columns is not None and p.target not in seeded:
            i += 1
            ctes.append(
                f"__rp{i} AS (SELECT *, CAST(NULL AS VARCHAR) AS {p.target} FROM {prev})"
            )
            seeded.add(p.target)
            prev = f"__rp{i}"
        i += 1
        ctes.append(
            f"__rp{i} AS (SELECT * REPLACE ({pass_expr_sql(p)} AS {p.target}) FROM {prev})"
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT * FROM __rp{i}"


# ---------------------------------------------------------------------------
# Reference rule content as data (sql/transformations/10_*.sql, 30_*.sql).
# Column names follow the reference dim_product: main_sku_code, english_name.
# ---------------------------------------------------------------------------


def _likes(col: str, *patterns: str) -> tuple[tuple[str, str, str], ...]:
    return tuple((col, "like", p) for p in patterns)


REFERENCE_CATEGORY_PASSES: tuple[RulePass, ...] = (
    # 10_*.sql pass 1 (lines 19-30): SKU prefixes, only where category IS NULL
    RulePass(
        target="category",
        guard=Guard(null=("category",)),
        whens=(
            When("Furniture", _likes("main_sku_code", "CN%", "NB%")),
            When("Outdoor & Garden", _likes("main_sku_code", "HZ%")),
            When("Automotive", _likes("main_sku_code", "SZ%")),
            When("Spare Parts", _likes("main_sku_code", "HIFINE%")),
        ),
        else_=KEEP,
        description="category from SKU prefixes (10_*.sql:19-30)",
    ),
    # pass 2 (lines 33-65): name keywords, ELSE 'Other', only where NULL
    RulePass(
        target="category",
        guard=Guard(null=("category",)),
        whens=(
            When(
                "Furniture",
                _likes(
                    "english_name",
                    "%sofa%",
                    "%chair%",
                    "%table%",
                    "%bench%",
                    "%mattress%",
                    "%cabinet%",
                ),
            ),
            When("Outdoor & Garden", _likes("english_name", "%gazebo%", "%garden%")),
            When("Automotive", _likes("english_name", "%car%", "%spoiler%")),
            When("Lighting", _likes("english_name", "%light%")),
            When("Spare Parts", _likes("english_name", "%spare%")),
            When("Storage & Organization", _likes("english_name", "%storage%")),
        ),
        else_="Other",
        description="category from name keywords (10_*.sql:33-65)",
    ),
    # pass 3 (lines 68-96): unguarded targeted overrides — can overwrite 1-2
    RulePass(
        target="category",
        guard=None,
        whens=(
            When("Automotive", _likes("main_sku_code", "CN1139-%")),
            When(
                "Automotive",
                _likes(
                    "english_name",
                    "%bumper diffuser%",
                    "%rear bumper diffuser%",
                    "%running boards%",
                ),
            ),
            When(
                "Lighting",
                _likes(
                    "english_name",
                    "%wafer light%",
                    "%mounting plate%",
                    "%led panel light%",
                    "%panel light%",
                ),
            ),
            When(
                "Outdoor & Garden",
                _likes("english_name", "%gazebo%", "%pergola%", "10*12%", "%metal roof%"),
            ),
            When(
                "Storage & Organization",
                _likes("english_name", "%loading ramp%", "%loading ramps%", "%ramp%")
                + (("english_name", "eq", "rack"),),
            ),
        ),
        else_=KEEP,
        description="targeted overrides (10_*.sql:68-96)",
    ),
    # pass 4 (lines 99-102): NULL -> 'Other'
    RulePass(
        target="category",
        guard=Guard(null=("category",)),
        whens=(),
        else_="Other",
        description="final NULL fallback (10_*.sql:99-102)",
    ),
)

REFERENCE_SUBCATEGORY_PASSES: tuple[RulePass, ...] = (
    # 30_*.sql pass A (lines 20-36): Outdoor & Garden, only when empty
    RulePass(
        target="subcategory",
        guard=Guard(eq=(("category", "Outdoor & Garden"),), null_or_blank=("subcategory",)),
        whens=(
            When("Gazebo / Pergola", _likes("english_name", "%gazebo%", "%pergola%")),
            When("Patio / Outdoor", _likes("english_name", "%patio%", "%outdoor%")),
            When("Garden", _likes("english_name", "%garden%", "%planter%", "%raised bed%")),
            When("Heating", _likes("english_name", "%fire pit%", "%heater%")),
            When("Umbrella", _likes("english_name", "%umbrella%")),
            When("Grill / BBQ", _likes("english_name", "%grill%", "%bbq%")),
            When("Swing / Hammock", _likes("english_name", "%swing%", "%hammock%")),
            When("Pool / Spa", _likes("english_name", "%pool%", "%spa%")),
        ),
        else_="Other Outdoor",
        description="Outdoor & Garden subcategory (30_*.sql:20-36)",
    ),
    # pass B (lines 39-53): Furniture baseline, only when empty
    RulePass(
        target="subcategory",
        guard=Guard(eq=(("category", "Furniture"),), null_or_blank=("subcategory",)),
        whens=(
            When("Sofa", _likes("english_name", "%sofa%")),
            When("Chair", _likes("english_name", "%chair%")),
            When("Table", _likes("english_name", "%table%")),
            When("Cabinet", _likes("english_name", "%cabinet%")),
            When("Bench", _likes("english_name", "%bench%")),
            When("Mattress", _likes("english_name", "%mattress%")),
        ),
        else_="Other Furniture",
        description="Furniture baseline subcategory (30_*.sql:39-53)",
    ),
    # pass C (lines 56-115): refine 'Other Furniture' — keyword order is load-bearing
    RulePass(
        target="subcategory",
        guard=Guard(eq=(("category", "Furniture"), ("subcategory", "Other Furniture"))),
        whens=(
            When("Bed", _likes("english_name", "%bed frame%", "%bed%")),
            When(
                "Dining Furniture",
                _likes("english_name", "%dining set%", "%dining table%", "%dining%"),
            ),
            When(
                "Occasional Tables",
                _likes("english_name", "%coffee table%", "%end table%", "%side table%"),
            ),
            When("Accent Chair", _likes("english_name", "%accent chair%")),
            When("Ottoman", _likes("english_name", "%ottoman%")),
            When("Loveseat", _likes("english_name", "%loveseat%")),
            When("Recliner", _likes("english_name", "%recliner%")),
            When("Chaise Lounge", _likes("english_name", "%chaise%")),
            When("Sectional Sofa", _likes("english_name", "%sectional%")),
            When("Daybed", _likes("english_name", "%daybed%")),
            When("Futon", _likes("english_name", "%futon%")),
            When("Console Table", _likes("english_name", "%console table%", "%entry table%")),
            When(
                "TV Stand / Media Console",
                _likes("english_name", "%tv stand%", "%media%", "%console%"),
            ),
            When("Wardrobe", _likes("english_name", "%wardrobe%", "%closet%")),
            When("Dresser", _likes("english_name", "%dresser%", "%chest%")),
            When("Nightstand", _likes("english_name", "%nightstand%", "%bedside%")),
            When("Storage Bench", _likes("english_name", "%storage bench%")),
            When("Storage Furniture", _likes("english_name", "%storage%", "%organizer%")),
            When("Shelving", _likes("english_name", "%bookshelf%", "%shelf%")),
            When("Kids Furniture", _likes("english_name", "%kids%", "%child%")),
            When("Furniture Sets", _likes("english_name", "%set%", "%bundle%")),
        ),
        else_="Other Furniture",
        description="refine Other Furniture (30_*.sql:56-115)",
    ),
    # pass D (lines 118-123): residue -> 'Furniture Sets & General'
    RulePass(
        target="subcategory",
        guard=Guard(eq=(("category", "Furniture"), ("subcategory", "Other Furniture"))),
        whens=(),
        else_="Furniture Sets & General",
        description="residue rename (30_*.sql:118-123)",
    ),
)


# ---------------------------------------------------------------------------
# Testdata rule content: same engine, keywords matched to the driver's
# synthetic part vocabulary (adjective+noun p_name, 6-value p_type) so
# the star-schema dashboards have a meaningful category distribution.
# Pass structure deliberately mirrors the reference's 4-pass shape,
# including an unguarded pass-3 override.
# ---------------------------------------------------------------------------

TESTDATA_CATEGORY_PASSES: tuple[RulePass, ...] = (
    RulePass(
        target="category",
        guard=Guard(null=("category",)),
        whens=(
            When("Value Line", _likes("p_type", "ECON%")),
            When("Promotional", _likes("p_type", "PROMO%")),
        ),
        else_=KEEP,
        description="category from type prefixes (pass 1)",
    ),
    RulePass(
        target="category",
        guard=Guard(null=("category",)),
        whens=(
            When("Jewelry", _likes("p_name", "%ring%")),
            When("Hardware", _likes("p_name", "%bolt%", "%rod%", "%plate%")),
            When("Mechanical", _likes("p_name", "%gear%", "%anvil%")),
            When("Gadgets", _likes("p_name", "%widget%", "%gizmo%")),
        ),
        else_="Other",
        description="category from name keywords (pass 2)",
    ),
    RulePass(
        target="category",
        guard=None,
        whens=(
            When("Premium Hardware", _likes("p_name", "%blue bolt%")),
            When("Collectibles", (("p_name", "eq", "old ring"),)),
        ),
        else_=KEEP,
        description="unguarded overrides (pass 3)",
    ),
    RulePass(
        target="category",
        guard=Guard(null=("category",)),
        whens=(),
        else_="Other",
        description="final NULL fallback (pass 4)",
    ),
)

TESTDATA_SUBCATEGORY_PASSES: tuple[RulePass, ...] = (
    RulePass(
        target="subcategory",
        guard=Guard(eq=(("category", "Hardware"),), null_or_blank=("subcategory",)),
        whens=(
            When("Bolts", _likes("p_name", "%bolt%")),
            When("Rods", _likes("p_name", "%rod%")),
            When("Plates", _likes("p_name", "%plate%")),
        ),
        else_="Other Hardware",
        description="hardware subcategory (pass A)",
    ),
    RulePass(
        target="subcategory",
        guard=Guard(null_or_blank=("subcategory",)),
        whens=(
            When("Hot Items", _likes("p_name", "hot %")),
            When("Cold Items", _likes("p_name", "cold %")),
            When("Compact", _likes("p_name", "small %")),
            When("Oversize", _likes("p_name", "large %")),
        ),
        else_="General",
        description="size/temperature subcategory (pass B)",
    ),
    RulePass(
        target="subcategory",
        guard=Guard(eq=(("subcategory", "Other Hardware"),)),
        whens=(),
        else_="Hardware General",
        description="residue rename (pass C)",
    ),
)
