"""Deterministic corpus sampling — the reproducibility-critical cousin
of ``df.sample()`` for training-data pipelines.

``rand()``-based sampling is a correctness hazard at 100 TB: a task
retry or a partition-count change re-draws the randomness and silently
changes the corpus.  These operators decide membership from
``md5(seed:key)`` alone — pure, engine-independent (DuckDB reproduces
the exact member set, see ``sample_predicate_sql``), stable under
retries, repartitioning, and AQE re-planning, and O(1) per row with no
shuffle (a Catalyst projection + filter that pushes down past column
pruning).

The same primitive yields leak-proof train/test assignment
(``assign_split``): membership of a key is a global property of the key,
so the same document can never land in both sides of a split, no matter
how many jobs, machines, or retries compute it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16^8 buckets from the first 8 md5 hex digits: granularity 6e-9, and
# the value fits comfortably in a long on both engines.
_BUCKETS = 16 ** 8


def sample_hash(key: Column, seed: int = 0) -> Column:
    """Uniform long in [0, 16^8) derived from md5("{seed}:{key}").

    NULL keys hash to NULL (``concat`` propagates, matching the SQL
    mirror's ``||``), so NULL-key rows are never sampled and
    ``assign_split`` sends them to 'train' — identically in both
    engines.  ``concat_ws`` would silently hash the bare seed string and
    sample every NULL-key row as one correlated block."""
    digest = F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string")))
    return F.conv(F.substring(digest, 1, 8), 16, 10).cast("long")


def deterministic_sample(df: DataFrame, fraction: float,
                         key_col: str = "doc_id",
                         seed: int = 0) -> DataFrame:
    """Keep ~``fraction`` of rows, membership decided by key hash only."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    bound = int(round(fraction * _BUCKETS))
    return df.filter(sample_hash(F.col(key_col), seed) < F.lit(bound))


def stratified_sample(df: DataFrame, fractions: dict[str, float],
                      strata_col: str, key_col: str = "doc_id",
                      seed: int = 0,
                      default_fraction: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. per-language quotas:
    keep 100% of low-resource languages, 1% of English).  Strata not in
    ``fractions`` get ``default_fraction``.  Unlike ``df.sampleBy`` the
    member set is reproducible and engine-independent."""
    for stratum, fraction in fractions.items():
        if not 0.0 <= fraction <= 1.0:
            raise ValueError(f"fraction for {stratum!r}: {fraction}")
    bound = F.lit(int(round(default_fraction * _BUCKETS)))
    for stratum, fraction in sorted(fractions.items()):
        bound = F.when(
            F.col(strata_col) == stratum,
            F.lit(int(round(fraction * _BUCKETS))),
        ).otherwise(bound)
    return df.filter(sample_hash(F.col(key_col), seed) < bound)


def assign_split(df: DataFrame, test_fraction: float,
                 key_col: str = "doc_id", seed: int = 0,
                 split_col: str = "split") -> DataFrame:
    """Add a leak-proof 'train'/'test' column: assignment is a pure
    function of the key, so no document can ever appear on both sides —
    across jobs, retries, or engines."""
    if not 0.0 <= test_fraction <= 1.0:
        raise ValueError(
            f"test_fraction must be in [0, 1], got {test_fraction}"
        )
    bound = int(round(test_fraction * _BUCKETS))
    return df.withColumn(
        split_col,
        F.when(
            sample_hash(F.col(key_col), seed) < F.lit(bound), F.lit("test")
        ).otherwise(F.lit("train")),
    )


def sample_predicate_sql(key_expr: str, fraction: float,
                         seed: int = 0) -> str:
    """The ANSI/DuckDB mirror of the membership predicate — digit-wise
    hex-to-int conversion of the first 8 md5 hex chars (the same
    strpos-based pattern the SimHash oracle uses), so an independent
    engine reproduces the exact member set."""
    bound = int(round(fraction * _BUCKETS))
    digest = f"md5('{seed}:' || CAST({key_expr} AS VARCHAR))"
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({digest}, {i + 1}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"(({terms}) < {bound})"


def quota_per_key(df: DataFrame, quota: int, key_col: str,
                  order_col: str = "doc_id") -> DataFrame:
    """Keep at most ``quota`` rows per key (e.g. per-host caps, the
    standard web-corpus anti-spam measure), deterministically: the
    winners are the ``quota`` smallest ``order_col`` values per key.

    Plan note: the rank filter compiles to ``WindowGroupLimit`` — Spark
    applies the limit map-side BEFORE the shuffle, so a hot host's
    millions of rows are cut to ``quota`` per input partition before any
    exchange (the pre-shuffle guard that makes this safe under host
    skew)."""
    from pyspark.sql.window import Window

    if quota < 1:
        raise ValueError(f"quota must be >= 1, got {quota}")
    w = Window.partitionBy(key_col).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= quota)
        .drop("_rn")
    )


def quota_predicate_sql(table_sql: str, quota: int, key_expr: str,
                        order_expr: str = "doc_id") -> str:
    """DuckDB mirror of ``quota_per_key`` (row_number cast to INT per
    the DuckDB type-cast rules in CLAUDE.md)."""
    return (
        f"SELECT * EXCLUDE (_rn) FROM ("
        f"SELECT *, CAST(row_number() OVER ("
        f"PARTITION BY {key_expr} ORDER BY {order_expr}) AS INT) AS _rn "
        f"FROM {table_sql}) WHERE _rn <= {quota}"
    )


def stratified_predicate_sql(strata_expr: str, key_expr: str,
                             fractions: dict[str, float], seed: int = 0,
                             default_fraction: float = 0.0) -> str:
    """DuckDB mirror of ``stratified_sample``'s membership predicate:
    the same per-stratum bounds as a CASE over the shared md5 hash
    terms (generated from the SAME constants, so the member sets are
    identical engine-to-engine)."""
    digest = f"md5('{seed}:' || CAST({key_expr} AS VARCHAR))"
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({digest}, {i + 1}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    cases = " ".join(
        f"WHEN {strata_expr} = '{stratum}' "
        f"THEN {int(round(fraction * _BUCKETS))}"
        for stratum, fraction in sorted(fractions.items())
    )
    default = int(round(default_fraction * _BUCKETS))
    return f"(({terms}) < (CASE {cases} ELSE {default} END))"


def mixture_fractions(counts: dict[str, int], weights: dict[str, float],
                      total: int | None = None
                      ) -> tuple[dict[str, float], int]:
    """Solve target mixture weights against observed stratum counts:
    the per-stratum keep fractions for the largest corpus (or the
    requested ``total``, capped) in which stratum k holds weight w_k
    WITHOUT upsampling any stratum.

    N* = min_k(n_k / w_k) is the binding constraint (the stratum that
    runs out first); fraction_k = N*w_k / n_k.  Driver-side arithmetic
    over the (tiny) stratum histogram — the per-row work stays the
    oracled md5 membership predicate."""
    w_total = sum(weights.values())
    if w_total <= 0:
        raise ValueError("weights must sum > 0")
    norm = {k: w / w_total for k, w in weights.items() if w > 0}
    missing = [k for k in norm if counts.get(k, 0) == 0]
    if missing:
        raise ValueError(
            f"strata with target weight but no rows: {sorted(missing)}"
        )
    n_star = min(counts[k] / w for k, w in norm.items())
    if total is not None:
        if total <= 0:
            raise ValueError(f"total must be positive: {total}")
        n_star = min(n_star, float(total))
    fractions = {k: min(1.0, n_star * w / counts[k])
                 for k, w in norm.items()}
    return fractions, int(n_star)


def mixture_sample(df: DataFrame, weights: dict[str, float],
                   strata_col: str, key_col: str = "doc_id",
                   seed: int = 0, total: int | None = None) -> DataFrame:
    """Deterministic domain-mixture sampling — the data-mixing step of
    a pretraining pipeline: downsample strata (domains, languages,
    sources) so the kept corpus matches target ``weights``.

    One tiny aggregation collects the stratum histogram (cardinality =
    number of strata, NOT rows — the only driver materialization),
    ``mixture_fractions`` solves the keep rates, and membership is the
    hash predicate of ``stratified_sample`` — reproducible under
    retries/repartition/AQE and mirrored by
    ``stratified_predicate_sql`` on the same computed fractions.
    Realized proportions are hash-binomial around the target (exact in
    expectation; tight at corpus scale)."""
    counts = {
        r["k"]: r["n"]
        for r in df.groupBy(F.col(strata_col).alias("k"))
        .agg(F.count("*").alias("n")).collect()
    }
    fractions, _ = mixture_fractions(counts, weights, total)
    return stratified_sample(df, fractions, strata_col, key_col, seed)
