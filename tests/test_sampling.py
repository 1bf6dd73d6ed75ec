"""Deterministic sampling operators (operators/sampling.py): exact
member-set reproducibility across engines (DuckDB cross-check), retries,
and partitionings — the property rand()-based sampling lacks."""

import duckdb
import pytest
from pyspark.sql import functions as F

from web_content_extraction_benchmark_spark.operators.sampling import (
    assign_split,
    deterministic_sample,
    sample_predicate_sql,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang"
    ).cache()


def test_member_set_matches_duckdb_exactly(docs, sf_dir):
    """The Spark predicate and the independent DuckDB mirror select the
    IDENTICAL member set — oracle-grade engine independence."""
    for fraction, seed in ((0.25, 0), (0.5, 7), (0.03, 42)):
        spark_ids = {
            r.doc_id
            for r in deterministic_sample(docs, fraction, seed=seed).collect()
        }
        duck_ids = {
            row[0]
            for row in duckdb.sql(
                f"SELECT doc_id FROM '{sf_dir}/documents.parquet' "
                f"WHERE {sample_predicate_sql('doc_id', fraction, seed)}"
            ).fetchall()
        }
        assert spark_ids == duck_ids, (fraction, seed)
        assert spark_ids  # non-degenerate at these fractions


def test_fraction_accuracy_and_seed_independence(docs):
    n = docs.count()
    kept = deterministic_sample(docs, 0.5, seed=1).count()
    assert abs(kept / n - 0.5) < 0.1
    a = {r.doc_id for r in deterministic_sample(docs, 0.3, seed=1).collect()}
    b = {r.doc_id for r in deterministic_sample(docs, 0.3, seed=2).collect()}
    assert a != b  # seeds draw different members
    # nested fractions with one seed: the 10% sample is a subset of 30%
    c = {r.doc_id for r in deterministic_sample(docs, 0.1, seed=1).collect()}
    assert c <= a


def test_stable_under_repartitioning(docs):
    """Membership is a pure key property: any physical layout (the
    stand-in for retries / AQE re-plans) yields the same sample."""
    base = {r.doc_id for r in deterministic_sample(docs, 0.4).collect()}
    shuffled = {
        r.doc_id
        for r in deterministic_sample(docs.repartition(17), 0.4).collect()
    }
    assert base == shuffled


def test_stratified_quotas(docs):
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    keep_all, keep_none = langs[0], langs[1]
    out = stratified_sample(
        docs, {keep_all: 1.0, keep_none: 0.0}, strata_col="lang"
    )
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    totals = {r.lang: r.n for r in docs.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    assert counts[keep_all] == totals[keep_all]
    assert keep_none not in counts
    # unlisted strata follow default_fraction=0.0
    assert set(counts) == {keep_all}


def test_split_is_leak_proof_and_exhaustive(docs):
    out = assign_split(docs, 0.2, seed=3)
    sides = out.groupBy("split").agg(F.count("*").alias("n")).collect()
    assert {r.split for r in sides} == {"train", "test"}
    assert sum(r.n for r in sides) == docs.count()
    # same key -> same side, even computed in a separate job
    again = assign_split(docs.repartition(5), 0.2, seed=3)
    joined = out.select("doc_id", "split").join(
        again.select("doc_id", F.col("split").alias("split2")), "doc_id"
    )
    assert joined.filter(F.col("split") != F.col("split2")).count() == 0


def test_sample_filter_is_shuffle_free(docs):
    plan = deterministic_sample(docs, 0.5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_bad_fraction_rejected(docs):
    with pytest.raises(ValueError):
        deterministic_sample(docs, 1.5)
    with pytest.raises(ValueError):
        stratified_sample(docs, {"en": -0.1}, strata_col="lang")


def test_quota_per_key_matches_duckdb(spark, sf_dir):
    """Per-host caps: winner set equals the DuckDB row_number mirror."""
    from web_content_extraction_benchmark_spark.operators.sampling import (
        quota_per_key,
        quota_predicate_sql,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang"
    )
    got = {
        r.doc_id
        for r in quota_per_key(docs, 30, key_col="lang").collect()
    }
    want = {
        row[0]
        for row in duckdb.sql(
            quota_predicate_sql(
                f"(SELECT doc_id, lang FROM "
                f"'{sf_dir}/documents.parquet')",
                30, "lang",
            )
        ).fetchall()
    }
    assert got == want and got
    # cap is respected per key
    counts = (
        quota_per_key(docs, 30, key_col="lang")
        .groupBy("lang").agg(F.count("*").alias("n")).collect()
    )
    assert all(r.n <= 30 for r in counts)


def test_quota_limit_applied_before_shuffle(spark, sf_dir):
    """The rank filter must compile to WindowGroupLimit with a map-side
    (Partial) pass — a hot host is cut to the quota per input partition
    BEFORE the exchange, which is what keeps per-host caps safe under
    web-scale host skew."""
    from web_content_extraction_benchmark_spark.operators.sampling import (
        quota_per_key,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang"
    )
    plan = quota_per_key(docs, 5, key_col="lang")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan, plan


def test_assign_split_rejects_bad_fraction(docs):
    from web_content_extraction_benchmark_spark.operators.sampling import (
        assign_split,
    )

    with pytest.raises(ValueError):
        assign_split(docs, 1.2)
    with pytest.raises(ValueError):
        assign_split(docs, -0.1)


def test_mixture_fractions_solver():
    from web_content_extraction_benchmark_spark.operators.sampling import (
        mixture_fractions,
    )

    counts = {"en": 8000, "de": 1000, "fr": 500}
    # fr is the binding stratum: N* = 500/0.2 = 2500
    fr, n = mixture_fractions(counts, {"en": 0.5, "de": 0.3, "fr": 0.2})
    assert n == 2500
    assert fr == {"en": 2500 * 0.5 / 8000, "de": 2500 * 0.3 / 1000,
                  "fr": 1.0}
    # requested total caps below N*
    fr2, n2 = mixture_fractions(counts, {"en": 1.0, "de": 1.0}, total=400)
    assert n2 == 400 and fr2 == {"en": 200 / 8000, "de": 200 / 1000}
    # weight on an absent stratum is an error, not silent skew
    with pytest.raises(ValueError, match="no rows"):
        mixture_fractions(counts, {"en": 0.5, "xx": 0.5})
    with pytest.raises(ValueError):
        mixture_fractions(counts, {"en": 0.0})
    with pytest.raises(ValueError):
        mixture_fractions(counts, {"en": 1.0}, total=0)


def test_mixture_sample_hits_weights_and_mirrors(docs, sf_dir):
    from web_content_extraction_benchmark_spark.operators.sampling import (
        mixture_fractions,
        mixture_sample,
        stratified_predicate_sql,
    )

    weights = {"en": 0.6, "de": 0.4}
    kept = mixture_sample(docs, weights, strata_col="lang", seed=3)
    by_lang = {r["lang"]: r["n"] for r in kept.groupBy("lang")
               .agg(F.count("*").alias("n")).collect()}
    assert set(by_lang) <= {"en", "de"}  # unweighted strata dropped
    total = sum(by_lang.values())
    # hash-binomial around the target: generous tolerance at sf0.001
    assert abs(by_lang.get("en", 0) / total - 0.6) < 0.12

    # determinism + exact DuckDB member-set mirror on the SAME solved
    # fractions
    counts = {r["lang"]: r["n"] for r in docs.groupBy("lang")
              .agg(F.count("*").alias("n")).collect()}
    fractions, _ = mixture_fractions(counts, weights)
    pred = stratified_predicate_sql("lang", "doc_id", fractions, seed=3)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    want = {r[0] for r in con.execute(
        f"SELECT doc_id FROM documents WHERE {pred}").fetchall()}
    got = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert got == want


def test_passage_split_semantics(spark):
    from web_content_extraction_benchmark_spark.operators.packing import (
        passage_split,
    )

    def passages(text, window, stride):
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = passage_split(df, window, stride).collect()
        return [(r.passage_idx, r.passage_text, r.n_tokens)
                for r in sorted(rows, key=lambda r: r.passage_idx)]

    words = " ".join(f"w{i}" for i in range(10))
    # window 4 / stride 3: starts 0,3,6; start 9 dropped (9+1 !< 10 is
    # false -> 9+1=10 not < 10 -> dropped; [6:10] already covers w9)
    got = passages(words, 4, 3)
    assert got == [
        (0, "w0 w1 w2 w3", 4),
        (1, "w3 w4 w5 w6", 4),
        (2, "w6 w7 w8 w9", 4),
    ]
    # tail passage shorter than window but not contained in predecessor
    got = passages(" ".join(f"w{i}" for i in range(6)), 4, 2)
    assert got == [
        (0, "w0 w1 w2 w3", 4),
        (1, "w2 w3 w4 w5", 4),
    ]
    # doc shorter than one window -> single short passage
    assert passages("a b", 8, 4) == [(0, "a b", 2)]
    # stride == window -> disjoint chunks, ragged tail kept
    assert passages(words, 3, 3) == [
        (0, "w0 w1 w2", 3), (1, "w3 w4 w5", 3),
        (2, "w6 w7 w8", 3), (3, "w9", 1),
    ]
    import pytest as _p
    with _p.raises(ValueError, match="stride"):
        passage_split(
            spark.createDataFrame([(1, "a")], "doc_id long, text string"),
            4, 5)
