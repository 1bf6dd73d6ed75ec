"""Golden export tests for the CSV / markdown metric sinks (S8/S9)."""

import glob
import os

from pyspark.sql import functions as F

from web_content_extraction_benchmark_spark.sources.reports import (
    export_report,
    write_metrics_csv,
)

GOLDEN_CSV = """model,dataset,mean_dist
plain,ds_a,0.25
plain,ds_b,1
readability,ds_a,0.123457
"""

GOLDEN_MD = """| model | dataset | mean_dist |
|---|---|---|
| plain | ds_a | 0.25 |
| plain | ds_b | 1 |
| readability | ds_a | 0.123457 |
"""


def _agg(spark):
    return spark.createDataFrame(
        [
            ("readability", "ds_a", 0.1234567),
            ("plain", "ds_b", 1.0),
            ("plain", "ds_a", 0.25),
        ],
        "model string, dataset string, mean_dist double",
    )


def test_export_report_golden(spark, tmp_path):
    paths = export_report(_agg(spark), str(tmp_path), name="scores")
    assert open(paths["csv"]).read() == GOLDEN_CSV
    assert open(paths["md"]).read() == GOLDEN_MD
    # deterministic across runs (sorted rows)
    again = export_report(_agg(spark), str(tmp_path), name="scores2")
    assert open(again["csv"]).read() == GOLDEN_CSV


def test_distributed_csv_sink_roundtrip(spark, tmp_path):
    df = _agg(spark)
    out = os.path.join(str(tmp_path), "csv_sink")
    write_metrics_csv(df.repartition(2), out)
    assert glob.glob(os.path.join(out, "part-*.csv"))
    back = spark.read.option("header", True).csv(out)
    assert back.count() == 3
    assert set(back.columns) == {"model", "dataset", "mean_dist"}
    assert (
        back.filter(
            (F.col("model") == "plain") & (F.col("dataset") == "ds_a")
        ).first()["mean_dist"]
        == "0.25"
    )


def test_csv_quoting():
    import pyspark.sql  # noqa: F401  (spark fixture not needed here)

    from web_content_extraction_benchmark_spark.sources.reports import _fmt

    assert _fmt(None) == ""
    assert _fmt(0.5) == "0.5"
    assert _fmt(1.0) == "1"
    assert _fmt("x") == "x"


def test_export_report_latex_and_null_safety(spark, tmp_path):
    """S9 tail: the .tex export escapes LaTeX specials, and rows with
    NULL cells sort without TypeError (ADVICE r2); csv.writer doubles
    embedded quotes."""
    df = spark.createDataFrame(
        [("a_b & c", None, 0.5), ('quo"te', "ds%1", None)],
        "model string, dataset string, mean_dist double",
    )
    paths = export_report(df, str(tmp_path), name="edge")
    tex = open(paths["tex"]).read()
    assert r"\&" in tex and r"a\_b" in tex and r"\%" in tex
    assert tex.startswith(r"\begin{tabular}{lll}")
    assert r"\toprule" in tex and r"\bottomrule" in tex
    csv_text = open(paths["csv"]).read()
    assert '"quo""te"' in csv_text  # RFC-4180 doubled quote
