"""Skew mitigation — salted joins (SCALE.md, SURVEY.md §7.2 step 10).

AQE's skew-join handling splits oversized shuffle partitions at
runtime and is the first line of defense (enabled in session.py).
Salting is the explicit fallback for the pathological case AQE can't
fix: ONE join key so hot that a single key's rows exceed an executor
(a null-key convention, a default user id, an empty-document hash) —
and, measured in r11 (tools/skew_ab.py, SKEW_AB.json, Spark 4.1.2),
for the join + same-key-aggregation shape, where the fused
exchange-free stage makes the AQE split structurally impossible even
under forceOptimizeSkewedJoin.

`salted_join` spreads each hot key over `salts` shuffle partitions by
appending a random salt to the big side's key and replicating the
small side once per salt value. Replication multiplies the small
side by `salts×` — use only when small ≪ big (dimension-sized) and
the big side is the skewed one.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    *,
    salts: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join `big ⋈ small` on `on`, with `big`'s hot keys spread
    across `salts` sub-partitions. Row-level results are identical to
    `big.join(small, on, how)`; only the shuffle distribution changes.
    Supported `how`: inner / left (the salted side must be the
    preserved side — a right/full outer would duplicate unmatched
    small-side rows per salt)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_big = big.withColumn(SALT, (F.rand(seed) * salts).cast("int"))
    exploded_small = small.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    out = salted_big.join(exploded_small, [*on, SALT], how)
    return out.drop(SALT)
