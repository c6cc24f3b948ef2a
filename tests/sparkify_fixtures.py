"""Inline Sparkify-shaped fixtures (FIXTURES.md §1-2).

Rows cover every must-include case: logged-out NULL-user rows, a user with
both 'free' and 'paid' levels (quirk Q3), played songs absent from the
catalog (J1 low match rate), ≥2 calendar hours, fiscal-year boundary
(March/April), December (Winter season), and a weekend day.
"""

from __future__ import annotations

from datetime import datetime, timezone


def ms(y, mo, d, h=0, mi=0, s=0, msec=0) -> int:
    return int(
        datetime(y, mo, d, h, mi, s, msec * 1000, tzinfo=timezone.utc).timestamp()
        * 1000
    )


# (artist, auth, firstName, gender, itemInSession, lastName, length, level,
#  location, method, page, registration, sessionId, song, status, ts,
#  userAgent, userId)
EVENTS_ROWS = [
    # Wed 2018-11-07, two plays same hour, user 1 'free' (matches catalog)
    ("The Kinks", "Logged In", "Ann", "F", 0, "Ray", 180.5, "free",
     "Portland, OR", "PUT", "NextSong", ms(2018, 10, 1), 10, "Lola", 200,
     ms(2018, 11, 7, 7, 21, 12, 345), "UA1", 1),
    ("Unknown Artist", "Logged In", "Ann", "F", 1, "Ray", 200.0, "free",
     "Portland, OR", "PUT", "NextSong", ms(2018, 10, 1), 10, "Ghost Song", 200,
     ms(2018, 11, 7, 7, 45, 0, 999), "UA1", 1),
    # same user later upgraded to 'paid' (quirk Q3: two dim_users rows)
    ("Daft Punk", "Logged In", "Ann", "F", 0, "Ray", 320.0, "paid",
     "Portland, OR", "PUT", "NextSong", ms(2018, 10, 1), 22, "Around The World",
     200, ms(2018, 12, 25, 18, 0, 0, 1), "UA1", 1),
    # weekend play (Sat 2018-11-10), user 2, no catalog match
    ("Garage Band", "Logged In", "Bo", "M", 0, "Li", 95.0, "paid",
     "Austin, TX", "PUT", "NextSong", ms(2018, 9, 15), 30, "Demo Tape", 200,
     ms(2018, 11, 10, 14, 5, 30, 500), "UA2", 2),
    # fiscal-year boundary plays (Mar 31 / Apr 1, 2019)
    ("The Kinks", "Logged In", "Bo", "M", 1, "Li", 180.5, "paid",
     "Austin, TX", "PUT", "NextSong", ms(2018, 9, 15), 31, "Lola", 200,
     ms(2019, 3, 31, 23, 30, 0), "UA2", 2),
    ("The Kinks", "Logged In", "Bo", "M", 2, "Li", 180.5, "paid",
     "Austin, TX", "PUT", "NextSong", ms(2018, 9, 15), 31, "Lola", 200,
     ms(2019, 4, 1, 0, 30, 0), "UA2", 2),
    # non-play pages: logged-out NULL-user row (contributes to dim_users)
    (None, "Logged Out", None, None, 0, None, None, "free", None, "GET",
     "Home", None, 40, None, 200, ms(2018, 11, 7, 8, 0, 0), None, None),
    # logged-in non-play page (excluded from fact, present in dims)
    (None, "Logged In", "Cy", "F", 1, "Wu", None, "free", "NYC", "GET",
     "Settings", ms(2018, 11, 1), 41, None, 200,
     ms(2018, 11, 4, 9, 15, 0), "UA3", 3),
]

EVENTS_COLUMNS = [
    "artist", "auth", "firstName", "gender", "itemInSession", "lastName",
    "length", "level", "location", "method", "page", "registration",
    "sessionId", "song", "status", "ts", "userAgent", "userId",
]

# (num_songs, artist_id, artist_latitude, artist_longitude, artist_location,
#  artist_name, song_id, title, duration, year)
SONGS_ROWS = [
    (1, "AR001", 51.50, -0.12, "London", "The Kinks", "SO001", "Lola", 180.5, 1970),
    (1, "AR002", 48.85, 2.35, "Paris", "Daft Punk", "SO002", "Around The World",
     320.0, 1997),
    (1, "AR002", 48.85, 2.35, "Paris", "Daft Punk", "SO003", "One More Time",
     305.0, 2000),
    # same artist twice (dim_artists dedups), empty-string location (≠ NULL)
    (1, "AR003", None, None, "", "Obscure Act", "SO004", "B-Side", 120.0, 0),
]

SONGS_COLUMNS = [
    "num_songs", "artist_id", "artist_latitude", "artist_longitude",
    "artist_location", "artist_name", "song_id", "title", "duration", "year",
]

#: NextSong rows above
N_PLAYS = 6
#: plays whose (artist, song) matches the catalog: rows 0, 2, 4, 5
N_MATCHED_PLAYS = 4


def make_events(spark):
    from udacitydatawarehouseprj_spark import schemas

    return spark.createDataFrame(EVENTS_ROWS, schema=schemas.STG_SONG_EVENTS)


def make_songs(spark):
    from udacitydatawarehouseprj_spark import schemas

    return spark.createDataFrame(SONGS_ROWS, schema=schemas.STG_SONGS)
