"""Derive the FROZEN bigram-LM score table (operators/lm.py) from the
sf0.001 fixture corpus — run once, paste the printed literals, and
re-verify the oracle at sf0.001 AND sf0.01 in the same commit
(CLAUDE.md frozen-model rule).  tests/test_lm.py re-derives these and
asserts exact equality, so a silent retrain cannot drift.

Scores are integer MICRO-log10-probabilities (round(log10(p) * 1e6))
of an add-one-smoothed word-bigram model:

    p(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + V_SMOOTH)

pinned as integers so both engines SUM exact integers — no float ever
crosses an engine boundary (the repo's oracle-float rule, applied the
strong way).

Usage: python tools/train_lm.py [sf_dir]   (prints the literals)
"""

from __future__ import annotations

import math
import sys
from collections import Counter

V_SMOOTH = 32  # 31-word fixture vocabulary + 1 unseen-token slot


def derive(sf_dir: str = "/root/testdata/sf0.001"):
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT text FROM '{sf_dir}/documents.parquet' ORDER BY text"
    ).fetchall()
    uni: Counter = Counter()
    bi: Counter = Counter()
    for (text,) in rows:
        toks = text.split(" ")
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    bigram = {
        (w1, w2): round(
            math.log10((c + 1) / (uni[w1] + V_SMOOTH)) * 1_000_000
        )
        for (w1, w2), c in bi.items()
    }
    backoff = {
        w1: round(math.log10(1 / (c + V_SMOOTH)) * 1_000_000)
        for w1, c in uni.items()
    }
    default = round(math.log10(1 / V_SMOOTH) * 1_000_000)
    return bigram, backoff, default


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    bigram, backoff, default = derive(sf_dir)
    print(f"DEFAULT_SCORE = {default}")
    print(f"V_SMOOTH = {V_SMOOTH}")
    print("FROZEN_BACKOFF = {")
    for w, s in sorted(backoff.items()):
        print(f"    {w!r}: {s},")
    print("}")
    print("FROZEN_BIGRAM = {")
    for (w1, w2), s in sorted(bigram.items()):
        print(f"    ({w1!r}, {w2!r}): {s},")
    print("}")


if __name__ == "__main__":
    main()
