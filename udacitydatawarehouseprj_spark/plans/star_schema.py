"""The Sparkify star-schema build — the reference's ``etl.py`` re-expressed
as pure DataFrame→DataFrame transforms.

Reference pipeline (etl.py:24-39): two S3 JSON COPYs into staging, then five
``INSERT INTO … SELECT`` transforms (sql_queries.py:155-303), fact first,
then four dimensions. Here each transform is a function of staging
DataFrames; ingestion lives in ``sources/`` and writing in
``sources/sinks.py`` — Catalyst fuses filter+project into the scan and AQE
picks join strategies, so these stay purely declarative.

Quirk handling (SURVEY §4):
* Q1 millisecond truncation — always on (it is the declared semantics).
* Q2 ``LIMIT 100`` inside the time-dim build — a leftover debug limit
  (author's own doubt at sql_queries.py:214). Fixed by default (build from
  ALL rows); pass ``limit_rows=100`` to reproduce the quirk bit-for-bit.
* Q3 dim_users keeps level-change duplicates and the NULL-user row —
  replicated by default (it is the declared DISTINCT-over-6-columns
  semantics); ``dedupe_by_user=True`` gives the fixed variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from udacitydatawarehouseprj_spark.functions import datetime as dtf

#: The core business predicate: a 'NextSong' page hit is a play event
#: (reference sql_queries.py:181 and the inference comment there).
PLAY_PAGE = "NextSong"


def build_fct_song_plays(events: DataFrame, songs: DataFrame) -> DataFrame:
    """Fact build (reference sql_queries.py:155-182).

    filter page='NextSong' → LEFT join the song catalog on the compound
    (artist, title) key → project/rename → derive time_key + truncated ts.

    LEFT join is deliberate: most played titles are absent from the catalog
    (reference comment sql_queries.py:175-176; measured 6,820 plays vs
    1,144 inner matches — Fiddle.ipynb cells 55-56).

    Scale: events is the big side; the song catalog is the smaller side and
    is broadcast (Redshift's ``distkey song_id`` co-location, SURVEY §4 O1,
    becomes a broadcast-hash join — zero shuffle of the fact stream). At
    catalog sizes beyond broadcast range, drop the hint and let AQE pick a
    shuffle join; pre-bucketing both sides by the join key restores
    co-location.
    """
    plays = events.filter(F.col("page") == PLAY_PAGE)
    catalog = F.broadcast(songs.select("artist_name", "title", "song_id"))
    joined = plays.join(
        catalog,
        (plays["artist"] == catalog["artist_name"])
        & (plays["song"] == catalog["title"]),
        "left",
    )
    ts = dtf.epoch_millis_to_ts("ts")
    return joined.select(
        F.col("auth"),
        F.col("itemInSession").alias("item_in_session"),
        F.col("level"),
        F.col("location"),
        F.col("sessionId").alias("session_id"),
        F.col("song_id"),
        F.col("userId").alias("user_id"),
        dtf.time_key(ts).alias("time_key"),
        ts.alias("ts"),
    )


def build_dim_users(events: DataFrame, dedupe_by_user: bool = False) -> DataFrame:
    """dim_users (reference sql_queries.py:184-193): DISTINCT over six
    columns — keeps one row per (user × level × …) combination, so a user
    upgrading free→paid appears twice and logged-out events contribute a
    NULL-user row (quirk Q3). ``dedupe_by_user=True`` is the fixed variant:
    one row per non-NULL user_id, latest by registration.
    """
    base = events.select(
        F.col("firstName").alias("firstname"),
        F.col("lastName").alias("lastname"),
        F.col("gender"),
        F.col("level"),
        F.col("registration"),
        F.col("userId").alias("user_id"),
    )
    if not dedupe_by_user:
        return base.distinct()
    return (
        base.filter(F.col("user_id").isNotNull())
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.col("registration").desc_nulls_last(), F.col("level")
                )
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def build_dim_songs(songs: DataFrame) -> DataFrame:
    """dim_songs (reference sql_queries.py:195-202). DISTINCT is a no-op on
    a catalog with unique song_id (invariant Q4) but kept for parity."""
    return songs.select("song_id", "title", "duration", "year").distinct()


def build_dim_artists(songs: DataFrame) -> DataFrame:
    """dim_artists (reference sql_queries.py:204-212)."""
    return songs.select(
        "artist_id",
        "artist_latitude",
        "artist_longitude",
        "artist_location",
        "artist_name",
    ).distinct()


def build_dim_time(
    events: DataFrame,
    limit_rows: int | None = None,
    ts_col: str = "ts",
    ts_is_epoch_millis: bool = True,
) -> DataFrame:
    """dim_time_dimensions (reference sql_queries.py:214-303).

    CTE of DISTINCT hour-truncated timestamps → 13 derived columns.
    ``limit_rows`` reproduces quirk Q2 (the reference builds from an
    arbitrary 100 staging rows — sql_queries.py:220); default None builds
    from all rows, which is the obviously intended semantics.

    The DISTINCT over hours is the only shuffle; everything after is
    per-row scalar derivation inside one codegen stage.
    """
    src = events if limit_rows is None else events.limit(limit_rows)
    ts = (
        dtf.epoch_millis_to_ts(ts_col) if ts_is_epoch_millis else F.col(ts_col)
    )
    hours = src.select(dtf.trunc_hour(ts).alias("trunc_time")).distinct()
    t = F.col("trunc_time")
    return hours.select(
        dtf.time_key(t).alias("time_key"),
        dtf.hour_key_int(t).alias("hour"),
        F.to_date(t).alias("date"),
        F.dayofmonth(t).cast("int").alias("day"),
        F.weekofyear(t).cast("int").alias("week"),
        F.month(t).cast("int").alias("month"),
        F.quarter(t).cast("int").alias("quarter"),
        F.year(t).cast("int").alias("year"),
        dtf.day_of_week(t).alias("day_of_week"),
        dtf.is_weekend(t).alias("is_weekend"),
        dtf.fiscal_year(t).alias("fiscal_year"),
        dtf.fiscal_quarter(t).alias("fiscal_quarter"),
        dtf.season(t).alias("season"),
        F.lit(None).cast("string").alias("special_event"),
    )


def build_star_schema(
    events: DataFrame,
    songs: DataFrame,
    time_dim_limit: int | None = None,
    dedupe_users: bool = False,
) -> dict[str, DataFrame]:
    """All five transforms, fact first (reference etl.py:17-21 ordering)."""
    return {
        "fct_song_plays": build_fct_song_plays(events, songs),
        "dim_users": build_dim_users(events, dedupe_by_user=dedupe_users),
        "dim_songs": build_dim_songs(songs),
        "dim_artists": build_dim_artists(songs),
        "dim_time_dimensions": build_dim_time(events, limit_rows=time_dim_limit),
    }
