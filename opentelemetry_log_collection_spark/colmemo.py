"""Process-level memo for PURE, config-derived Column expression trees.

Column objects are immutable handles on unresolved expression trees —
safely shareable across plans and queries (resolution happens per
plan at analysis time) — but BUILDING a large tree costs one py4j
round-trip per function call (~200us each on this box), and the
operators rebuilt identical trees on every pipeline construction:
measured 0.4-1.1s of pure Python-side construction per benched
parse-chain query (cProfile: 4,715 round-trips for the flagship
chain, 0.78s in socket reads alone).

Rules for memoized builders:
  - the key must capture EVERYTHING the tree depends on — every
    config value and the repr of every input Column (``str(col)``
    prints the full unresolved expression, one cheap round-trip);
  - the builder must be deterministic: no rand()/
    monotonically_increasing_id()/generated alias names;
  - only JVM-expression trees qualify (no Python UDF closures whose
    identity matters).

The memo is process-wide and unbounded; entries are one JVM
expression handle per distinct operator config — bounded by the set
of configs a driver constructs, not by data.
"""

from __future__ import annotations

from typing import Callable, Hashable

from pyspark.sql import Column

_MEMO: dict = {}


def memo_column(key: Hashable, builder: Callable[[], Column]) -> Column:
    col = _MEMO.get(key)
    if col is None:
        col = builder()
        _MEMO[key] = col
    return col
