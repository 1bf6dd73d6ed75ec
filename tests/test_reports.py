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


def test_score_distribution_tables_golden(spark, tmp_path):
    """Histogram + box-plot data tables (the numbers behind the
    reference's eval.py:284-327 plots) as deterministic exports."""
    from web_content_extraction_benchmark_spark.sources.reports import (
        score_boxplot_stats,
        score_histogram,
    )

    scores = spark.createDataFrame(
        [("m1", s) for s in (0.0, 0.1, 0.1, 0.5, 1.0)]
        + [("m2", s) for s in (0.2, 0.4, 0.6, 0.8)],
        "model string, f1 double",
    )
    hist = {
        (r.model, r.bin): (r.bin_lo, r.bin_hi, r.n)
        for r in score_histogram(scores, "f1", bins=10).collect()
    }
    # 0.1 lands in bin 1 [0.1, 0.2); 1.0 clamps into the last bin
    assert hist[("m1", 0)] == (0.0, 0.1, 1)
    assert hist[("m1", 1)] == (0.1, 0.2, 2)
    assert hist[("m1", 5)] == (0.5, 0.6, 1)
    assert hist[("m1", 9)] == (0.9, 1.0, 1)
    assert hist[("m2", 2)][2] == 1 and hist[("m2", 8)][2] == 1
    assert sum(v[2] for (m, _), v in hist.items() if m == "m1") == 5

    box = {r.model: r for r in score_boxplot_stats(scores, "f1").collect()}
    m1 = box["m1"]
    assert (m1["min"], m1["median"], m1["max"]) == (0.0, 0.1, 1.0)
    assert m1["q25"] == 0.1 and m1["q75"] == 0.5  # exact interpolated
    assert m1["mean"] == round((0.0 + 0.1 + 0.1 + 0.5 + 1.0) / 5, 6)
    assert m1["lower_err"] == round(abs(m1["mean"] - m1["q25"]), 6)
    assert m1["upper_err"] == round(abs(m1["q75"] - m1["mean"]), 6)
    m2 = box["m2"]
    assert (m2["min"], m2["max"], m2["n"]) == (0.2, 0.8, 4)
    assert m2["median"] == 0.5

    # the export path renders them like any aggregate table
    paths = export_report(
        score_boxplot_stats(scores, "f1"), str(tmp_path), name="box"
    )
    content = open(paths["csv"]).read()
    assert content.splitlines()[0] == (
        "model,n,min,q25,median,q75,max,mean,lower_err,upper_err"
    )
    assert len(content.splitlines()) == 3


def test_xlsx_export_stdlib_verified(spark, tmp_path):
    """S9 XLSX sink, from scratch: the written file must be a valid
    SpreadsheetML package (verified by unzipping and parsing the XML
    parts with stdlib ElementTree — no third-party reader), with a bold
    header row and the per-column numeric maximum in bold, mirroring
    the reference's pandas-Styler highlight (eval.py:201-239)."""
    import zipfile
    from xml.etree import ElementTree as ET

    paths = export_report(_agg(spark), str(tmp_path), name="scores")
    assert paths["xlsx"].endswith("scores.xlsx")

    NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(paths["xlsx"]) as zf:
        names = set(zf.namelist())
        assert {"[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
                "xl/_rels/workbook.xml.rels", "xl/styles.xml",
                "xl/worksheets/sheet1.xml"} <= names
        sheet = ET.fromstring(zf.read("xl/worksheets/sheet1.xml"))
        styles = ET.fromstring(zf.read("xl/styles.xml"))

    # style table: style 1 is the bold font
    fonts = styles.findall(f"{NS}fonts/{NS}font")
    assert fonts[1].find(f"{NS}b") is not None

    rows = sheet.findall(f"{NS}sheetData/{NS}row")
    assert len(rows) == 4  # header + 3 data rows (sorted)

    def cells(row):
        out = {}
        for c in row.findall(f"{NS}c"):
            ref, style = c.get("r"), c.get("s")
            t = c.find(f"{NS}is/{NS}t")
            v = c.find(f"{NS}v")
            out[ref] = (t.text if t is not None else
                        (v.text if v is not None else None), style)
        return out

    header = cells(rows[0])
    assert header["A1"] == ("model", "1")  # bold header
    assert header["C1"][0] == "mean_dist"
    body = [cells(r) for r in rows[1:]]
    # rows sort canonically: plain/ds_a 0.25, plain/ds_b 1.0, readability
    assert body[0]["A2"][0] == "plain" and body[0]["C2"][0] == "0.25"
    # the numeric max (1.0) is bold; other numeric cells are not
    assert body[1]["C3"] == ("1.0", "1")
    assert body[0]["C2"][1] is None
    assert body[2]["C4"][1] is None


def test_xlsx_column_refs_and_escaping(tmp_path, spark):
    import zipfile
    from xml.etree import ElementTree as ET

    from web_content_extraction_benchmark_spark.sources.xlsx import (
        column_ref,
        write_xlsx,
    )

    assert [column_ref(i) for i in (0, 25, 26, 27, 701, 702)] == [
        "A", "Z", "AA", "AB", "ZZ", "AAA"
    ]
    path = write_xlsx(
        str(tmp_path / "esc.xlsx"), ["a<b", "n"],
        [["x & <y>", 3], [None, 7]],
    )
    NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(path) as zf:
        sheet = ET.fromstring(zf.read("xl/worksheets/sheet1.xml"))
    texts = [t.text for t in sheet.iter(f"{NS}t")]
    assert "a<b" in texts and "x & <y>" in texts  # XML-escaped, parses back


def test_xlsx_nonfinite_floats_stay_wellformed(tmp_path):
    import zipfile
    from xml.etree import ElementTree as ET

    from web_content_extraction_benchmark_spark.sources.xlsx import write_xlsx

    path = write_xlsx(
        str(tmp_path / "nf.xlsx"), ["v"],
        [[float("nan")], [float("inf")], [1.5]],
    )
    NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(path) as zf:
        sheet = ET.fromstring(zf.read("xl/worksheets/sheet1.xml"))
    # no numeric <v> carries nan/inf (invalid SpreadsheetML numbers)
    numeric = [
        c.find(f"{NS}v").text
        for c in sheet.iter(f"{NS}c")
        if c.get("t") is None and c.find(f"{NS}v") is not None
    ]
    assert numeric == ["1.5"]
    texts = [t.text for t in sheet.iter(f"{NS}t")]
    assert "nan" in texts and "inf" in texts
