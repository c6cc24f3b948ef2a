"""Skew-handling join strategies.

At 100 TB a handful of hot keys (the NULL user, the viral song, the
default catalog entry) can put one shuffle partition orders of magnitude
above the rest. Two remedies, in preference order:

1. AQE skew-join splitting (``spark.sql.adaptive.skewJoin.enabled`` — on by
   default in ``session.get_spark``): Spark splits oversized partitions at
   runtime. Zero code. Handles sort-merge joins.
2. **Salting** (this module) for the cases AQE can't fix — e.g. an
   aggregation-free shuffle join where one key exceeds a single executor's
   memory even after splitting, or engines/versions without AQE. The
   skewed (large) side gets a uniform random-ish salt derived from a
   unique column; the small side is replicated across all salt values; the
   join key becomes (key, salt), spreading each hot key over N partitions.

The salt derivation is hash-based (xxhash64 of a unique column), NOT
``rand()`` — results stay deterministic and re-runnable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    unique_col: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``large ⋈ small`` on column ``on`` with the large side salted.

    ``unique_col`` is any column of ``large`` that distributes rows within
    a key (an id, an offset — uniqueness not required, just spread). The
    small side is replicated ``num_salts``× — keep it genuinely small
    (dimension-sized); the join itself is then a plain equi-join on
    (on, salt) with no hot partitions.

    Result is row-identical to ``large.join(small, on, how)`` for
    ``inner``/``left`` joins — salt only changes physical distribution.
    Right/full outer joins are rejected: an unmatched small-side row exists
    once per salt replica, so the null-padded output rows would be
    duplicated ``num_salts``×. (Salting the large side cannot help a
    right/full outer anyway — the skew lives on the large side.)
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got how={how!r}: "
            "unmatched small-side rows would be replicated once per salt"
        )
    salted_large = large.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(unique_col)), F.lit(num_salts)).cast("int")
    )
    salts = F.explode(
        F.array(*[F.lit(i) for i in range(num_salts)])
    ).alias("_salt")
    replicated_small = small.select("*", salts)
    out = salted_large.join(replicated_small, [on, "_salt"], how)
    return out.drop("_salt")
