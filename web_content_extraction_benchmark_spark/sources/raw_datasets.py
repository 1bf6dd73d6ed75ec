"""Raw dataset ingestion (SURVEY S1): binaryFile scan -> decode ->
format-specific unwrap / truth derivation -> whitelist semi-join.

Distributed re-expression of the reference's dataset-reader family
(/root/reference/src/extraction_benchmark/dataset_readers.py): the two
representative formats are

- CleanEval-style (dataset_readers.py:135-168): raw pages wrapped in a
  ``<text id=...>`` element (stripped), truth files carrying a leading
  ``URL: http://...`` line plus lightly-marked-up clean text (parsed as
  HTML, whitespace-squeezed, URL line removed);
- L3S-GN1-style (dataset_readers.py:264-298): truth is an *annotated*
  copy of the page where content elements carry CSS classes
  ``x-nc-sel1..3``; derivation walks leaf elements with those classes,
  prefixing a newline when the parent is block-level.

Driver-side listing in the reference becomes a ``binaryFile`` scan here;
each file decodes through the shared ``encoding.decode_html`` path
(auto-gunzip, BOM, meta-charset sniff, cp1252 fallback), and the
conversion joins pages to derived truths with the same whitelist
semi-join semantics as the reference's extract whitelist
(extract.py:63-74).

Deviation (documented): derived truth text is ``.strip()``-ed, so the
oracle formulas are trailing-whitespace-free.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..dom import BLOCK_ELEMENTS, body_or_root, parse_html
from ..encoding import decode_html

# CleanEval <text ...> wrapper strip (reference dataset_readers.py:146).
_TEXT_TAG_RE = re.compile(r"(?:^<text [^>]+>\s*|\s*</text>$)", flags=re.MULTILINE)
_URL_LINE_RE = re.compile(r"^\s*URL: (https?://.+)")
_URL_STRIP_RE = re.compile(r"^\s*URL:[^\n]+\s*")
_NL_SPACE_RE = re.compile(r"\n +")

L3S_CONTENT_CLASSES = frozenset({"x-nc-sel1", "x-nc-sel2", "x-nc-sel3"})


def cleaneval_unwrap(content: str) -> str:
    """Strip the CleanEval ``<text ...>`` wrapper from a raw page."""
    return _TEXT_TAG_RE.sub("", content)


def cleaneval_truth(content: str) -> tuple[str | None, str]:
    """(url, clean_text) from a CleanEval truth file: URL header line +
    HTML-ish clean markup -> body text, squeezed, URL line removed."""
    url_match = _URL_LINE_RE.search(content)
    url = url_match.group(1) if url_match else None
    text = body_or_root(parse_html(content)).text_content()
    text = _NL_SPACE_RE.sub("\n", text)
    text = _URL_STRIP_RE.sub("", text)
    return url, text.strip()


def l3s_truth(content: str) -> str:
    """Truth text from an L3S-GN1-style annotated page: leaf elements with
    an ``x-nc-sel*`` class; block-level parents prefix a newline
    (reference dataset_readers.py:283-298 semantics)."""
    body = body_or_root(parse_html(content))
    parts: list[str] = []
    for node in body.iter():
        if node.is_text or not (
            set(node.attr("class").split()) & L3S_CONTENT_CLASSES
        ):
            continue
        if len(node.children) != 1 or not node.children[0].is_text:
            continue  # leaf elements only (avoid double-counting parents)
        if node.parent is not None and node.parent.tag in BLOCK_ELEMENTS:
            parts.append("\n")
        parts.append(node.children[0].text.strip() + " ")
    return "".join(parts).strip()


def read_binary_dir(spark: SparkSession, path: str,
                    glob: str = "*") -> DataFrame:
    """binaryFile scan of a raw dataset directory: (source, content).

    ``source`` is the file stem — the reference's per-file key."""
    df = spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    return df.select(
        F.regexp_extract(F.col("path"), r"([^/]+?)(?:\.[a-z0-9]+)?$", 1).alias(
            "source"
        ),
        F.col("content"),
    )


_CLEANEVAL_PAGE_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("html", T.StringType(), True),
    ]
)

_CLEANEVAL_TRUTH_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("plaintext", T.StringType(), True),
    ]
)


def _cleaneval_pages(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "source": pdf["source"],
                "html": [
                    cleaneval_unwrap(decode_html(raw)) for raw in pdf["content"]
                ],
            }
        )


def _cleaneval_truths(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        urls, texts = [], []
        for raw in pdf["content"]:
            url, text = cleaneval_truth(decode_html(raw))
            urls.append(url)
            texts.append(text)
        yield pd.DataFrame(
            {"source": pdf["source"], "url": urls, "plaintext": texts}
        )


def convert_cleaneval(spark: SparkSession, raw_dir: str,
                      truth_dir: str) -> DataFrame:
    """CleanEval conversion plan: (source, url, html, plaintext), one row
    per page that has a truth file (whitelist semi-join on the truth
    side, like the reference's truth-driven extract whitelist)."""
    pages = read_binary_dir(spark, raw_dir).mapInPandas(
        _cleaneval_pages, schema=_CLEANEVAL_PAGE_SCHEMA
    )
    truths = read_binary_dir(spark, truth_dir).mapInPandas(
        _cleaneval_truths, schema=_CLEANEVAL_TRUTH_SCHEMA
    )
    return pages.join(F.broadcast(truths), "source").select(
        "source", "url", "html", "plaintext"
    )


_L3S_TRUTH_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("plaintext", T.StringType(), True),
    ]
)


def _l3s_pages(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "source": pdf["source"],
                "html": [decode_html(raw) for raw in pdf["content"]],
            }
        )


def _l3s_truths(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "source": pdf["source"],
                "plaintext": [
                    l3s_truth(decode_html(raw)) for raw in pdf["content"]
                ],
            }
        )


def convert_l3s(spark: SparkSession, original_dir: str,
                annotated_dir: str) -> DataFrame:
    """L3S-GN1 conversion plan: (source, html, plaintext); truth derived
    from the annotated copy, joined to the original page bytes."""
    pages = read_binary_dir(spark, original_dir).mapInPandas(
        _l3s_pages, schema=T.StructType(
            [
                T.StructField("source", T.StringType(), False),
                T.StructField("html", T.StringType(), True),
            ]
        )
    )
    truths = read_binary_dir(spark, annotated_dir).mapInPandas(
        _l3s_truths, schema=_L3S_TRUTH_SCHEMA
    )
    return pages.join(F.broadcast(truths), "source").select(
        "source", "html", "plaintext"
    )


# ---------------------------------------------------------------------------
# Deterministic raw-format synthesis (fixture generation): builds on-disk
# CleanEval / L3S trees from the documents parquet so the conversion plans
# have DuckDB-expressible expected outputs.  Pure pyarrow — no Spark.
# ---------------------------------------------------------------------------


def synthesize_cleaneval_tree(sf_dir: str, out_dir: str,
                              mod: int = 7) -> int:
    """Write CleanEval-style orig/ + clean/ trees for documents with
    ``doc_id % mod == 0`` (non-empty pages only).  Edge encodings carried
    over from the pages synthesis: gzip bytes for %103 rows, UTF-8 BOM for
    %107 rows.  Returns the number of pages written."""
    import gzip
    import os

    import pyarrow.parquet as pq

    from .pages import build_page_html, gold_main_text, url_for

    os.makedirs(os.path.join(out_dir, "orig"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "clean"), exist_ok=True)
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    ).to_pylist()
    n = 0
    for row in docs:
        doc_id, source, text = row["doc_id"], row["source"], row["text"]
        if doc_id % mod != 0 or doc_id % 101 == 0:
            continue
        html = build_page_html(doc_id, source, text)
        wrapped = f'<text id="{doc_id}">\n{html}\n</text>'
        if doc_id % 107 == 0:
            wrapped = "\ufeff" + wrapped
        raw = wrapped.encode("utf-8")
        if doc_id % 103 == 0:
            raw = gzip.compress(raw, compresslevel=1, mtime=0)
        with open(os.path.join(out_dir, "orig", f"{doc_id}.html"), "wb") as f:
            f.write(raw)
        truth = (
            f"URL: {url_for(doc_id, source)}\n\n"
            f"<p>{gold_main_text(doc_id, source, text)}</p>\n"
        )
        with open(os.path.join(out_dir, "clean", f"{doc_id}.txt"), "wb") as f:
            f.write(truth.encode("utf-8"))
        n += 1
    return n


def l3s_annotated_html(source: str, text: str) -> str:
    """One L3S-GN1-style annotated page (original = same without the
    annotation spans)."""
    return (
        "<html><body>"
        f'<div><span class="x-nc-sel1">Article {source}</span></div>'
        f'<p><span class="x-nc-sel2">{text}</span></p>'
        '<aside><a href="/promo">promo</a> <a href="/more">more</a></aside>'
        "</body></html>"
    )


def l3s_original_html(source: str, text: str) -> str:
    return (
        "<html><body>"
        f"<div>Article {source}</div>"
        f"<p>{text}</p>"
        '<aside><a href="/promo">promo</a> <a href="/more">more</a></aside>'
        "</body></html>"
    )


def l3s_original_sql() -> str:
    """DuckDB expression for the original L3S page string — generated from
    the same Python template via sentinel substitution (lockstep)."""
    rendered = l3s_original_html("\x00SRC\x00", "\x00TXT\x00")
    expr = "'" + rendered.replace("'", "''") + "'"
    expr = expr.replace("\x00SRC\x00", "' || source || '")
    expr = expr.replace("\x00TXT\x00", "' || text || '")
    return expr


def synthesize_l3s_tree(sf_dir: str, out_dir: str, mod: int = 7) -> int:
    """Write L3S-GN1-style original/ + annotated/ trees."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(os.path.join(out_dir, "original"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "annotated"), exist_ok=True)
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    ).to_pylist()
    n = 0
    for row in docs:
        doc_id, source, text = row["doc_id"], row["source"], row["text"]
        if doc_id % mod != 0 or doc_id % 101 == 0:
            continue
        orig = l3s_original_html(source, text)
        anno = l3s_annotated_html(source, text)
        with open(
            os.path.join(out_dir, "original", f"{doc_id}.html"), "wb"
        ) as f:
            f.write(orig.encode("utf-8"))
        with open(
            os.path.join(out_dir, "annotated", f"{doc_id}.html"), "wb"
        ) as f:
            f.write(anno.encode("utf-8"))
        n += 1
    return n
