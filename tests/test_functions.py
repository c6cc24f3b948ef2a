"""Unit fixtures for the datetime scalar layer (SURVEY §2.8, §4 Q1).

Pins the reference's quirky semantics: millisecond truncation (F1), DOW
numbering (F12), fiscal calendar and season boundaries (F13/F14), and the
golden spot row from Fiddle.ipynb cell 51 (2018-11-07 07:00).
"""

from __future__ import annotations

from datetime import date, datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from udacitydatawarehouseprj_spark.functions import datetime as dtf
from tests.sparkify_fixtures import ms


def _eval(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_epoch_millis_truncates(spark):
    # 2018-11-03 01:04:33.987 → whole-second 01:04:33 (reference
    # sql_queries.py:168 integer division; verified output in
    # Fiddle.ipynb cell 54)
    millis = ms(2018, 11, 3, 1, 4, 33, 987)
    got = _eval(spark, dtf.epoch_millis_to_ts(F.lit(millis)))
    assert got == datetime(2018, 11, 3, 1, 4, 33)


def test_time_key_format(spark):
    millis = ms(2018, 11, 3, 1, 4, 33, 987)
    got = _eval(spark, dtf.time_key(dtf.epoch_millis_to_ts(F.lit(millis))))
    assert got == 2018110301
    # single-digit month/hour zero-padded
    got2 = _eval(spark, dtf.time_key(dtf.epoch_millis_to_ts(F.lit(ms(2019, 4, 1, 0, 30)))))
    assert got2 == 2019040100


def test_day_of_week_numbering(spark):
    # reference: 1=Sunday .. 7=Saturday (sql_queries.py:246-250)
    sun = F.lit("2018-11-04 12:00:00").cast("timestamp")
    wed = F.lit("2018-11-07 12:00:00").cast("timestamp")
    sat = F.lit("2018-11-10 12:00:00").cast("timestamp")
    assert _eval(spark, dtf.day_of_week(sun)) == 1
    assert _eval(spark, dtf.day_of_week(wed)) == 4
    assert _eval(spark, dtf.day_of_week(sat)) == 7
    assert _eval(spark, dtf.is_weekend(sun)) is True
    assert _eval(spark, dtf.is_weekend(wed)) is False
    assert _eval(spark, dtf.is_weekend(sat)) is True


def test_fiscal_calendar_boundaries(spark):
    # April-start fiscal year (reference sql_queries.py:258-285)
    cases = {
        "2019-03-31 23:30:00": (2018, 4),  # last minute of FY2018 Q4
        "2019-04-01 00:30:00": (2019, 1),  # first of FY2019 Q1
        "2018-07-15 00:00:00": (2018, 2),
        "2018-11-07 07:00:00": (2018, 3),  # golden row (Fiddle cell 51)
        "2018-12-25 18:00:00": (2018, 3),
        "2019-01-02 00:00:00": (2018, 4),  # Jan belongs to prior FY
    }
    for ts, (fy, fq) in cases.items():
        c = F.lit(ts).cast("timestamp")
        assert _eval(spark, dtf.fiscal_year(c)) == fy, ts
        assert _eval(spark, dtf.fiscal_quarter(c)) == fq, ts


def test_season_boundaries(spark):
    cases = {
        "2018-12-01": "Winter",
        "2019-02-28": "Winter",
        "2019-03-01": "Spring",
        "2019-05-31": "Spring",
        "2019-06-01": "Summer",
        "2018-09-01": "Fall",
        "2018-11-07": "Fall",  # golden row
    }
    for d, season in cases.items():
        c = F.lit(f"{d} 00:00:00").cast("timestamp")
        assert _eval(spark, dtf.season(c)) == season, d


def test_golden_time_dim_row(spark):
    """Fiddle.ipynb cell 51 output: 2018-11-07 07:00 → time_key 2018110707,
    week 45, quarter 4, day_of_week 4, is_weekend False, fiscal_year 2018,
    fiscal_quarter 3, season Fall."""
    from udacitydatawarehouseprj_spark.plans import star_schema

    df = spark.createDataFrame(
        [Row(ts=ms(2018, 11, 7, 7, 21, 12, 345))]
    )
    row = star_schema.build_dim_time(df).collect()[0]
    assert row.time_key == 2018110707
    assert row.hour == 7
    assert row.date == date(2018, 11, 7)
    assert row.day == 7
    assert row.week == 45
    assert row.month == 11
    assert row.quarter == 4
    assert row.year == 2018
    assert row.day_of_week == 4
    assert row.is_weekend is False
    assert row.fiscal_year == 2018
    assert row.fiscal_quarter == 3
    assert row.season == "Fall"
    assert row.special_event is None
