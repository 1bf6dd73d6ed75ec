"""Shared positional word-k-gram builder.

One home for the subtle guard CLAUDE.md calls out: Spark's
``sequence(1, 0)`` DESCENDS ([1, 0]) instead of returning empty, and
``slice`` with start 0 throws — so documents shorter than k words must
short-circuit to an explicit empty array.  Three kernels (MinHash
shingles, Gopher bigrams, winnowing grams) previously each carried a
private copy of this construction; a future change to the guard now has
exactly one place to land.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def positional_kgrams(words: Column, k: int,
                      transform: Callable[[Column], Column] | None = None
                      ) -> Column:
    """Array of positional word k-grams of a word-array column (one gram
    per start position, order preserved, duplicates kept).  ``transform``
    maps each gram inside the same projection (e.g. ``F.md5`` for
    winnowing's hashed grams)."""
    n = F.size(words)

    def gram(i: Column) -> Column:
        g = F.concat_ws(" ", F.slice(words, i, k))
        return transform(g) if transform is not None else g

    return F.when(
        n >= k,
        F.transform(F.sequence(F.lit(1), n - (k - 1)), gram),
    ).otherwise(F.array().cast("array<string>"))
