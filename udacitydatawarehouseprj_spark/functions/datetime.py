"""Datetime scalar functions (SURVEY §2.8 F1-F14).

These reproduce the reference's timestamp semantics exactly — including
the quirks — as composable Column expressions:

* F1  epoch-millis → timestamp with MILLISECOND TRUNCATION: the reference
  computes ``TIMESTAMP 'epoch' + ts/1000 * INTERVAL '1 second'`` where
  ``ts`` is BIGINT, so ``/1000`` is Redshift integer division and the
  sub-second part is dropped (reference sql_queries.py:168,173,219;
  SURVEY §4 Q1).
* F3  time_key: hour-truncated timestamp formatted ``YYYYMMDDHH`` and cast
  to bigint (reference sql_queries.py:164-172; README.md:85 — the int
  surrogate chosen to make the fact↔time join cheap).
* F12 day_of_week: Redshift DOW is 0=Sun..6=Sat and the reference adds 1
  (reference sql_queries.py:246-250). Spark's ``dayofweek`` is already
  1=Sun..7=Sat, so it maps directly — no +1.
* F13/F14 is_weekend / fiscal calendar (April-start) / season
  (reference sql_queries.py:251-300).

All pure built-ins — these stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def epoch_millis_to_ts(ts_millis: Column | str) -> Column:
    """F1: epoch milliseconds → timestamp, truncating the millisecond part.

    Matches Redshift's BIGINT integer division ``ts/1000`` (reference
    sql_queries.py:168). NOT ``timestamp_millis`` — that would keep the
    fractional second and diverge from the reference (SURVEY §4 Q1).
    """
    c = _col(ts_millis).cast("long")
    # floor == truncation for non-negative epochs; use explicit integer
    # division so pre-1970 inputs still truncate toward -inf consistently
    # on both Spark and the DuckDB oracle (// in DuckDB is also floor).
    return F.timestamp_seconds(F.floor(c / F.lit(1000)).cast("long"))


def trunc_hour(ts: Column | str) -> Column:
    """F2: date_trunc('hour', ts) (reference sql_queries.py:166,219)."""
    return F.date_trunc("hour", _col(ts))


def time_key(ts: Column | str) -> Column:
    """F3: hour-grain int surrogate key YYYYMMDDHH as bigint
    (reference sql_queries.py:164-172)."""
    return F.date_format(trunc_hour(ts), "yyyyMMddHH").cast("long")


def hour_key_int(ts: Column | str) -> Column:
    """F5 (idiomatic form): the reference extracts the hour by substringing
    the text form of the truncated timestamp (sql_queries.py:224);
    ``hour()`` is the equivalent built-in."""
    return F.hour(_col(ts)).cast("int")


def day_of_week(ts: Column | str) -> Column:
    """F12: 1=Sunday .. 7=Saturday (reference sql_queries.py:246-250).

    Spark's dayofweek already uses this numbering; the reference's ``+1``
    only compensated for Redshift's 0-based DOW.
    """
    return F.dayofweek(_col(ts)).cast("int")


def is_weekend(ts: Column | str) -> Column:
    """F13: true iff Saturday/Sunday (reference sql_queries.py:251-257)."""
    return F.dayofweek(_col(ts)).isin(1, 7)


def fiscal_year(ts: Column | str) -> Column:
    """F14: April-start fiscal year — months 1-3 belong to the prior year
    (reference sql_queries.py:258-268)."""
    c = _col(ts)
    return (
        F.when(F.month(c).between(1, 3), F.year(c) - 1).otherwise(F.year(c))
    ).cast("int")


def fiscal_quarter(ts: Column | str) -> Column:
    """F14: months 1-3→Q4, 4-6→Q1, 7-9→Q2, 10-12→Q3
    (reference sql_queries.py:269-285)."""
    m = F.month(_col(ts))
    return (
        F.when(m.between(1, 3), F.lit(4))
        .when(m.between(4, 6), F.lit(1))
        .when(m.between(7, 9), F.lit(2))
        .otherwise(F.lit(3))
    ).cast("int")


def season(ts: Column | str) -> Column:
    """F13: Dec/Jan/Feb→Winter, Mar-May→Spring, Jun-Aug→Summer, else Fall
    (reference sql_queries.py:286-300)."""
    m = F.month(_col(ts))
    return (
        F.when(m.isin(12, 1, 2), F.lit("Winter"))
        .when(m.isin(3, 4, 5), F.lit("Spring"))
        .when(m.isin(6, 7, 8), F.lit("Summer"))
        .otherwise(F.lit("Fall"))
    )
