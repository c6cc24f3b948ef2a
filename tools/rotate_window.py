"""Propose next round's WINDOW_PRIORITY (the driver's 50-entry
correctness window, queries.py).

Policy: a hard-signal row is only recorded for the first DRIVER_WINDOW
entries of ``queries()``, so the window must ROTATE — queries keep their
slot only until they have a green driver row, then hand it to queries
that never had one. This script reads every CORRECTNESS_r*.json in the
repo root, computes which oracled queries have ever had a green
(rows+schema+hash) row, and prints a proposed WINDOW_PRIORITY list:

1. the flagship (always in-window: it is the driver's smoke query);
2. every oracled query NEEDING SIGNAL, in registry order (invariant
   checks naturally come early via registration). Needing signal means
   either (a) no green driver row in any round, or (b) the query's MOST
   RECENT driver row is red — a once-green query that regresses must
   stay in the window until it goes green again, not rotate out on the
   strength of its old green (round-3 advice: green_by_round alone
   dropped regressions from hard-signal monitoring);
3. if slots remain, the LONGEST-UNVERIFIED green queries (oldest green
   round first) to re-confirm stability.

Usage: python tools/rotate_window.py   # prints the list to paste
"""

from __future__ import annotations

import glob
import json
import sys

sys.path.insert(0, ".")

from udacitydatawarehouseprj_spark import queries as Q  # noqa: E402


def driver_status() -> tuple[dict[str, int], dict[str, int]]:
    """(query -> latest green round, query -> latest round seen at all).

    A row is green only when rows+schema+hash all match; latest_seen
    tracks every row so a red row AFTER the last green is detectable
    (latest_seen > latest_green ⇒ the most recent driver signal is red).
    """
    latest_green: dict[str, int] = {}
    latest_seen: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(path.split("_r")[1].split(".")[0])
        data = json.load(open(path))
        for name, row in data.items():
            latest_seen[name] = max(latest_seen.get(name, 0), rnd)
            if row.get("rows_match") and row.get("schema_match") and row.get(
                "hash_match"
            ):
                latest_green[name] = max(latest_green.get(name, 0), rnd)
    return latest_green, latest_seen


def main() -> None:
    greens, seen = driver_status()
    oracled = set(Q.oracle_sql())
    registry_order = [n for n in Q.REGISTRY if n in oracled]

    def needs_signal(n: str) -> bool:
        return n not in greens or seen.get(n, 0) > greens[n]

    window: list[str] = ["flagship_hourly_activity"]
    never = [
        n for n in registry_order
        if needs_signal(n) and n != "flagship_hourly_activity"
    ]
    window += never[: Q.DRIVER_WINDOW - 1]
    if len(window) < Q.DRIVER_WINDOW:
        stale = sorted(
            (n for n in registry_order if not needs_signal(n) and n not in window),
            key=lambda n: greens[n],
        )
        window += stale[: Q.DRIVER_WINDOW - len(window)]

    n_new = len([n for n in window if needs_signal(n)])
    print(f"# proposed WINDOW_PRIORITY ({n_new} needing signal, "
          f"{len(window)} total):")
    print("WINDOW_PRIORITY: list[str] = [")
    for n in window:
        if n not in greens and n not in seen:
            tag = "  # never driver-verified"
        elif needs_signal(n):
            tag = "  # latest driver row RED — re-check"
        else:
            tag = ""
        print(f'    "{n}",{tag}')
    print("]")


if __name__ == "__main__":
    main()
