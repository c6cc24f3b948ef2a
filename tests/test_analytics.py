"""The reference's notebook analytics on the Sparkify fixtures — each
assertion derives from the fixture rows (the full-dataset goldens 8,056 /
6,820 / 1,144 are pinned in BASELINE.md; fixtures scale them down)."""

from __future__ import annotations

from udacitydatawarehouseprj_spark.plans import analytics, star_schema
from tests import sparkify_fixtures as fx


def test_page_counts(spark):
    counts = {r.page: r["count"]
              for r in analytics.page_counts(fx.make_events(spark)).collect()}
    assert counts["NextSong"] == fx.N_PLAYS
    assert counts["Home"] == 1 and counts["Settings"] == 1


def test_auth_counts_for_plays(spark):
    counts = {r.auth: r["count"]
              for r in analytics.auth_counts_for_plays(
                  fx.make_events(spark)).collect()}
    # mirrors the notebook's validation: every play row is 'Logged In'
    assert counts == {"Logged In": fx.N_PLAYS}


def test_song_artist_grouping_sets(spark):
    rows = analytics.song_artist_grouping_sets(fx.make_events(spark)).collect()
    by_key = {(r.song, r.artist): r["count"] for r in rows}
    # song-only granularity (artist NULL) and song×artist granularity
    assert by_key[("Lola", None)] == 3
    assert by_key[("Lola", "The Kinks")] == 3
    assert by_key[("Demo Tape", None)] == 1


def test_match_counts(spark):
    ev, so = fx.make_events(spark), fx.make_songs(spark)
    assert analytics.play_count(ev) == fx.N_PLAYS
    assert analytics.catalog_match_count(ev, so) == fx.N_MATCHED_PLAYS
    unmatched = analytics.unmatched_plays(ev, so).collect()
    assert len(unmatched) == fx.N_PLAYS - fx.N_MATCHED_PLAYS
    assert {r.song for r in unmatched} == {"Ghost Song", "Demo Tape"}


def test_catalog_search(spark):
    so = fx.make_songs(spark)
    assert {r.artist_name
            for r in analytics.search_artists(so, "KINKS").collect()} == {"The Kinks"}
    assert {r.title
            for r in analytics.search_titles(so, "world").collect()} == {"Around The World"}


def test_table_counts_sweep(spark):
    ev, so = fx.make_events(spark), fx.make_songs(spark)
    star = star_schema.build_star_schema(ev, so)
    counts = analytics.table_counts(star)
    assert counts == {
        "fct_song_plays": fx.N_PLAYS,
        "dim_users": 5,
        "dim_songs": 4,
        "dim_artists": 3,
        "dim_time_dimensions": 7,
    }
