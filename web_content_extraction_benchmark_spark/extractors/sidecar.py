"""External-binary extractor deployment pattern (E6, DOM Distiller
shape).

The reference runs a Go sidecar binary ONCE PER DOCUMENT — temp file +
subprocess per page (reference extractors/go_domdistiller/__init__.py:
6-14, called from extractors.py:53-55).  That shape is untenable at
10^12 documents (a process fork per page), and the binary itself cannot
ship in this sandbox.  The Spark-first re-expression demonstrated here
runs ONE LONG-LIVED sidecar process per partition via ``RDD.pipe`` —
the one genuinely RDD-only surface in this engine — streaming
length-prefixed-free JSONL over stdin/stdout:

    pages -> toJSON (url + base64 html) -> rdd.pipe(command)
          -> parse JSONL -> (url, plaintext) DataFrame

Per partition the cost is one process spawn + pipelined I/O, not a fork
per page.  The protocol is binary-agnostic: any executable that maps
one input JSON line to one output JSON line slots in (the real Go
distiller would wrap its extract loop in 10 lines of Go).  Tests and
the driver query use ``tools/sidecar_stub.py`` as the stand-in
executable; it applies this engine's own plain extractor, so the piped
output has a true SQL oracle (PLAIN_SQL) instead of a rows-only check.
"""

from __future__ import annotations

import os
import shlex

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SIDECAR_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("plaintext", T.StringType(), True),
    ]
)


def sidecar_extract(pages: DataFrame, command: list[str],
                    env: dict[str, str] | None = None) -> DataFrame:
    """pages -> (url, plaintext) through an external per-partition
    sidecar process speaking JSONL ({url, html_b64} in, {url, plaintext}
    out).  ``command`` is argv for the sidecar executable."""
    spark = pages.sparkSession
    payload = pages.select(
        "url", F.base64(F.col("html")).alias("html_b64")
    ).toJSON()
    # checkCode=True: a sidecar that dies mid-partition (OOM, bad input)
    # must FAIL the task, not silently truncate its partition's output —
    # undetectable data loss at corpus scale otherwise.  FAILFAST on the
    # JSONL parse for the same reason (PERMISSIVE would turn malformed
    # sidecar output into all-null rows).
    piped = payload.pipe(
        shlex.join(command), env=env or {}, checkCode=True
    )
    out = spark.read.schema(SIDECAR_OUTPUT_SCHEMA).option(
        "mode", "FAILFAST"
    ).json(piped)
    return out.select("url", "plaintext")


def stub_sidecar_command() -> tuple[list[str], dict[str, str]]:
    """(argv, env) for the stand-in sidecar: this engine's plain
    extractor behind the JSONL protocol."""
    import sys

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    stub = os.path.join(repo_root, "tools", "sidecar_stub.py")
    return [sys.executable, stub], {"PYTHONPATH": repo_root}
