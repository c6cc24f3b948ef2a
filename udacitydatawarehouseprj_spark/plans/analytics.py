"""The reference's ad-hoc notebook analytics, reproduced query-for-query.

``Fiddle.ipynb`` is the reference's entire analytical read path (~15
queries over staging + star tables, cells 36-61). Each function here is
one notebook query re-expressed on Sparkify-schema DataFrames, so a user
of the reference can run every analysis they run today. Cell citations
follow SURVEY.md's greppable convention.

All single-shuffle or shuffle-free plans; the catalog side of each join is
broadcast (it is the small side by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def page_counts(events: DataFrame) -> DataFrame:
    """Cell 38 (json:30186): SELECT page, count(1) FROM song_events
    GROUP BY 1 — the page-distribution eyeball check."""
    return events.groupBy("page").agg(F.count(F.lit(1)).alias("count"))


def auth_counts_for_plays(events: DataFrame) -> DataFrame:
    """Cell 39 (json:30245): auth distribution under the play filter —
    validated all 6,820 NextSong rows were 'Logged In'."""
    return (
        events.filter(F.col("page") == "NextSong")
        .groupBy("auth")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def song_artist_grouping_sets(events: DataFrame) -> DataFrame:
    """Cell 53 (json:31700): GROUP BY GROUPING SETS ((song), (song,
    artist)) — play counts at two granularities in one pass."""
    events.createOrReplaceTempView("_fiddle_events")
    return events.sparkSession.sql(
        """
        SELECT song, artist, count(1) AS count
        FROM _fiddle_events
        WHERE page = 'NextSong'
        GROUP BY GROUPING SETS ((song), (song, artist))
        """
    )


def play_count(events: DataFrame) -> int:
    """Cell 55 (json:31560): COUNT of NextSong events (golden: 6,820 on
    the full dataset)."""
    return events.filter(F.col("page") == "NextSong").count()


def catalog_match_count(events: DataFrame, songs: DataFrame) -> int:
    """Cell 56 (json:31965): inner-join match rate of plays against the
    catalog on the compound (artist, title) key (golden: 1,144 of 6,820)."""
    plays = events.filter(F.col("page") == "NextSong")
    catalog = F.broadcast(songs.select("artist_name", "title"))
    return plays.join(
        catalog,
        (plays["artist"] == catalog["artist_name"])
        & (plays["song"] == catalog["title"]),
        "inner",
    ).count()


def search_artists(songs: DataFrame, needle: str) -> DataFrame:
    """Cell 59 (json:32483): WHERE lower(artist_name) LIKE '%kanye%'."""
    return songs.filter(F.lower(F.col("artist_name")).like(f"%{needle.lower()}%"))


def search_titles(songs: DataFrame, needle: str) -> DataFrame:
    """Cell 60: WHERE lower(title) LIKE '%celeb%'."""
    return songs.filter(F.lower(F.col("title")).like(f"%{needle.lower()}%"))


def unmatched_plays(events: DataFrame, songs: DataFrame) -> DataFrame:
    """Cell 61 (json:34162-34165): plays with no catalog match — the
    reference's LEFT JOIN … WHERE songs.title IS NULL idiom, expressed as
    the native anti join it denotes."""
    plays = events.filter(F.col("page") == "NextSong")
    catalog = F.broadcast(songs.select("artist_name", "title"))
    return plays.join(
        catalog,
        (plays["artist"] == catalog["artist_name"])
        & (plays["song"] == catalog["title"]),
        "left_anti",
    )


def table_counts(tables: dict[str, DataFrame]) -> dict[str, int]:
    """Cells 44-50 (json:30648-30996): the one-COUNT-per-table validation
    sweep run after every ETL load."""
    return {name: df.count() for name, df in tables.items()}
