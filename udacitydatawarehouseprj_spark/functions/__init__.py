"""Scalar function library — Column-in / Column-out, JVM-side only.

Every function here compiles to built-in Catalyst expressions (no Python
UDFs) so the relational hot path stays inside whole-stage codegen.
"""

from udacitydatawarehouseprj_spark.functions.datetime import (  # noqa: F401
    day_of_week,
    epoch_millis_to_ts,
    fiscal_quarter,
    fiscal_year,
    hour_key_int,
    is_weekend,
    season,
    time_key,
    trunc_hour,
)
