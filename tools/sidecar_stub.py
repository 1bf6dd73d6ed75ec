#!/usr/bin/env python
"""Stand-in sidecar executable for the E6 external-binary pattern
(extractors/sidecar.py): reads JSON lines {"url", "html_b64"} on stdin,
writes JSON lines {"url", "plaintext"} on stdout — one line per line,
pipelined, exactly the protocol a real Go DOM-Distiller wrapper would
speak.  Uses this engine's own decode + plain extractor so the piped
output is SQL-oracle-checkable (PLAIN_SQL)."""

from __future__ import annotations

import base64
import json
import sys


def main() -> None:
    # PYTHONPATH is provided by the caller (rdd.pipe env); on a real
    # cluster the sidecar is a static binary with no Python at all.
    from web_content_extraction_benchmark_spark.encoding import decode_html
    from web_content_extraction_benchmark_spark.extractors.baseline import (
        extract_plain,
    )

    out = sys.stdout
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        row = json.loads(line)
        raw = base64.b64decode(row.get("html_b64") or "")
        try:
            text = extract_plain(decode_html(raw))
        except Exception:
            text = ""
        out.write(json.dumps({"url": row["url"], "plaintext": text}))
        out.write("\n")
    out.flush()


if __name__ == "__main__":
    main()
