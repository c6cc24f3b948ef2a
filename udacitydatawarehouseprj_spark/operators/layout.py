"""Physical-layout operators: multi-dimensional clustering for scan
pruning.

Parquet scans skip row groups / files whose column min-max stats exclude
the predicate. A sort on one column gives perfect skipping on that
column and none on others; interleaving the BITS of several columns
(Morton / Z-order) gives each dimension locality ~1/k of the curve, so a
2-D box predicate prunes most row groups on BOTH columns. This is the
layout step a 100 TB table runs at write time (`zorder_layout` =
range-repartition + in-partition sort by the Z key) so that later
point/box queries never scan the full table.

Everything is integer Column arithmetic (shift/and/sum) — codegen'd,
no UDFs, and bit-for-bit replayable in the SQL oracle.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zorder_key_expr(cols: list[str], bits: int = 8) -> F.Column:
    """Morton Z-key: interleave the low ``bits`` bits of each column.

    Column i contributes its bit b to output position b*k + i (k = number
    of columns). Inputs must already be bucketed to [0, 2**bits) —
    callers normalize with ``% 2**bits`` or a width bucket; the key is a
    BIGINT so k*bits ≤ 63. ``cols`` entries may be column names or SQL
    expressions (parsed with ``F.expr``).
    """
    k = len(cols)
    if k * bits > 63:
        raise ValueError(f"z-key needs {k * bits} bits; max 63")
    terms = [
        F.shiftleft(
            F.shiftright(F.expr(c).cast("long"), b).bitwiseAND(F.lit(1)),
            b * k + i,
        )
        for i, c in enumerate(cols)
        for b in range(bits)
    ]
    return functools.reduce(operator.add, terms)


def zorder_key_sql(cols: list[str], bits: int = 8) -> str:
    """The identical Z-key in ANSI SQL (oracle replay)."""
    k = len(cols)
    terms = [
        f"(((CAST({c} AS BIGINT) >> {b}) & 1) << {b * k + i})"
        for i, c in enumerate(cols)
        for b in range(bits)
    ]
    return " + ".join(terms)


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    num_partitions: int | None = None,
    key_col: str = "z_key",
) -> DataFrame:
    """Cluster ``df`` for multi-dimensional skipping: range-partition by
    the Z key, sort within partitions, keep the key column. Writing the
    result to parquet yields files AND row groups whose min-max ranges
    tile the Z curve — box predicates on any clustered column prune."""
    out = df.withColumn(key_col, zorder_key_expr(cols, bits))
    parts = [num_partitions] if num_partitions else []
    return out.repartitionByRange(*parts, key_col).sortWithinPartitions(key_col)
