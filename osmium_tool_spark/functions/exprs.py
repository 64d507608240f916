"""Expression helpers.

`bind` works around a Catalyst evaluation hazard: a non-trivial
subexpression (e.g. a tokenization `split`) referenced from k sibling
expressions — or from element_at calls inside a transform loop — is
re-evaluated k times per row (no common-subexpression elimination across
higher-order-function boundaries, and CollapseProject re-inlines plain
projections). Binding the value as a single-element-array lambda variable
forces exactly one evaluation per row; lambda-variable reads are O(1).
Measured ~20x on word-shingle construction (operators/dedup.py).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind(col: Column, fn: Callable[[Column], Column]) -> Column:
    """Evaluate `col` once per row, pass it to `fn` as a lambda variable."""
    return F.get(F.transform(F.array(col), fn), 0)
