"""Metric export sinks (SURVEY S8/S9).

The reference writes per-run score CSVs and renders report tables/plots
driver-side (/root/reference/src/extraction_benchmark/eval.py:93-95 CSV,
201-239 xlsx/LaTeX/plots).  Two surfaces here:

- ``write_metrics_csv``: the distributed sink — plain ``df.write.csv``
  with a header, for metric tables that are still big (per-page scores);
- ``export_report``: the driver-side tail for *aggregated* tables (tens
  of rows): collects once and renders CSV + a markdown table (the
  xlsx/LaTeX equivalent without third-party writers; matplotlib plots are
  a documented exclusion — driver-side viz).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_metrics_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Distributed CSV metric sink (header row, escaped quoting)."""
    df.write.mode(mode).option("header", True).csv(path)


def _fmt(value) -> str:
    if value is None:
        return ""
    if isinstance(value, float):
        return f"{value:.6f}".rstrip("0").rstrip(".")
    return str(value)


def export_report(agg_df: DataFrame, out_dir: str,
                  name: str = "metrics") -> dict[str, str]:
    """Collect a (small, aggregated) DataFrame and write ``<name>.csv``,
    ``<name>.md``, ``<name>.tex`` and ``<name>.xlsx`` under ``out_dir``.
    Row order is canonicalized by sorting on all columns so exports are
    reproducible.  Returns the written paths."""
    import csv

    os.makedirs(out_dir, exist_ok=True)
    cols = agg_df.columns
    # None-safe canonical order (None is not orderable against non-None
    # in Python; ADVICE r2) that keeps NUMERIC columns numerically
    # ordered (str(v) alone would put 10.5 before 2.1), then RFC-4180
    # CSV via csv.writer (doubled quotes, embedded newlines handled).
    def _cell_key(v):
        if v is None:
            return (2, "", 0.0)
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            return (1, str(v), 0.0)
        return (0, "", float(v))

    typed_rows = sorted(
        (tuple(r) for r in agg_df.collect()),
        key=lambda row: [_cell_key(v) for v in row],
    )
    rows = [[_fmt(v) for v in row] for row in typed_rows]
    csv_path = os.path.join(out_dir, f"{name}.csv")
    with open(csv_path, "w", encoding="utf-8", newline="") as f:
        writer = csv.writer(f, lineterminator="\n")
        writer.writerow(cols)
        writer.writerows(rows)
    md_path = os.path.join(out_dir, f"{name}.md")
    with open(md_path, "w", encoding="utf-8") as f:
        f.write("| " + " | ".join(cols) + " |\n")
        f.write("|" + "|".join("---" for _ in cols) + "|\n")
        for row in rows:
            f.write("| " + " | ".join(row) + " |\n")
    tex_path = os.path.join(out_dir, f"{name}.tex")
    with open(tex_path, "w", encoding="utf-8") as f:
        f.write(_latex_table(cols, rows))
    from .xlsx import write_xlsx

    xlsx_path = write_xlsx(
        os.path.join(out_dir, f"{name}.xlsx"), cols,
        [list(r) for r in typed_rows], sheet_name=name,
    )
    return {"csv": csv_path, "md": md_path, "tex": tex_path,
            "xlsx": xlsx_path}


_TEX_ESCAPES = {
    "\\": r"\textbackslash{}", "&": r"\&", "%": r"\%", "$": r"\$",
    "#": r"\#", "_": r"\_", "{": r"\{", "}": r"\}",
    "~": r"\textasciitilde{}", "^": r"\textasciicircum{}",
}


def _tex(value: str) -> str:
    return "".join(_TEX_ESCAPES.get(ch, ch) for ch in value)


def _latex_table(cols: list[str], rows: list[list[str]]) -> str:
    """booktabs LaTeX table (the reference's score-table export,
    eval.py:201-239, without the pandas/xlsxwriter dependency)."""
    lines = [
        r"\begin{tabular}{" + "l" * len(cols) + "}",
        r"\toprule",
        " & ".join(_tex(c) for c in cols) + r" \\",
        r"\midrule",
    ]
    for row in rows:
        lines.append(" & ".join(_tex(v) for v in row) + r" \\")
    lines += [r"\bottomrule", r"\end{tabular}", ""]
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# Distribution tables — the data behind the reference's plots
# ---------------------------------------------------------------------------


def score_histogram(scores: DataFrame, score_col: str = "f1",
                    bins: int = 25) -> DataFrame:
    """Per-model score histogram — the numbers behind the reference's
    ``_plot_score_histograms`` (eval.py:303-327: 25 bins over [0, 1],
    one panel per model) as a plain table so downstream plotting needs
    no Spark.  Fully distributed: bin assignment is a Catalyst
    expression and the exchange carries (model, bin) partial counts,
    never score rows."""
    from pyspark.sql import functions as F

    clamped = F.greatest(F.lit(0.0), F.least(F.lit(1.0), F.col(score_col)))
    b = F.least(
        F.floor(clamped * bins).cast("int"), F.lit(bins - 1)
    )
    return (
        # NULL scores are EXCLUDED, matching the null-ignoring aggregates
        # in score_boxplot_stats — null-skipping least/greatest would
        # otherwise count a NULL page as a perfect score in the top bin
        scores.filter(F.col(score_col).isNotNull())
        .select("model", b.alias("bin"))
        .groupBy("model", "bin")
        .agg(F.count("*").alias("n"))
        .select(
            "model",
            "bin",
            F.round(F.col("bin") / bins, 6).alias("bin_lo"),
            F.round((F.col("bin") + 1) / bins, 6).alias("bin_hi"),
            "n",
        )
    )


def score_boxplot_stats(scores: DataFrame,
                        score_col: str = "f1") -> DataFrame:
    """Per-model box/bar-plot statistics — the numbers behind the
    reference's per-model box plots and mean bar plots with
    q25/q75 error bars (eval.py:284-295): min, exact interpolated
    quartiles, max, mean, and the asymmetric error-bar halves
    |mean - q25| / |q75 - mean|."""
    from pyspark.sql import functions as F

    q = F.percentile(
        F.col(score_col),
        F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)),
    )
    agg = scores.groupBy("model").agg(
        F.count("*").alias("n"),
        F.min(score_col).alias("mn"),
        F.max(score_col).alias("mx"),
        F.mean(score_col).alias("mean_raw"),
        q.alias("q"),
    )
    mean = F.col("mean_raw")
    q25, q75 = F.col("q")[0], F.col("q")[2]
    return agg.select(
        "model",
        "n",
        F.round("mn", 6).alias("min"),
        F.round(q25, 6).alias("q25"),
        F.round(F.col("q")[1], 6).alias("median"),
        F.round(q75, 6).alias("q75"),
        F.round("mx", 6).alias("max"),
        F.round(mean, 6).alias("mean"),
        F.round(F.abs(mean - q25), 6).alias("lower_err"),
        F.round(F.abs(q75 - mean), 6).alias("upper_err"),
    )
