"""Propose next round's WINDOW_PRIORITY (the driver's 50-entry
correctness window, queries.py).

Policy: a hard-signal row is only recorded for the first DRIVER_WINDOW
entries of ``queries()``, so the window must ROTATE — queries keep their
slot only until they have a green driver row, then hand it to queries
that never had one. This script reads every CORRECTNESS_r*.json in the
repo root, computes which oracled queries have ever had a green
(rows+schema+hash) row, and prints a proposed WINDOW_PRIORITY list:

1. the flagship (always in-window: it is the driver's smoke query);
2. every oracled query with NO green row in any round, in registry
   order (invariant checks naturally come early via registration);
3. if slots remain, the LONGEST-UNVERIFIED green queries (oldest round
   first) to re-confirm stability.

Usage: python tools/rotate_window.py   # prints the list to paste
"""

from __future__ import annotations

import glob
import json
import sys

sys.path.insert(0, ".")

from udacitydatawarehouseprj_spark import queries as Q  # noqa: E402


def green_by_round() -> dict[str, int]:
    """query -> latest round with a fully-green driver row."""
    out: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(path.split("_r")[1].split(".")[0])
        data = json.load(open(path))
        for name, row in data.items():
            if row.get("rows_match") and row.get("schema_match") and row.get(
                "hash_match"
            ):
                out[name] = max(out.get(name, 0), rnd)
    return out


def main() -> None:
    greens = green_by_round()
    oracled = set(Q.oracle_sql())
    registry_order = [n for n in Q.REGISTRY if n in oracled]

    window: list[str] = ["flagship_hourly_activity"]
    never = [
        n for n in registry_order
        if n not in greens and n != "flagship_hourly_activity"
    ]
    window += never[: Q.DRIVER_WINDOW - 1]
    if len(window) < Q.DRIVER_WINDOW:
        stale = sorted(
            (n for n in registry_order if n in greens and n not in window),
            key=lambda n: greens[n],
        )
        window += stale[: Q.DRIVER_WINDOW - len(window)]

    n_new = len([n for n in window if n not in greens])
    print(f"# proposed WINDOW_PRIORITY ({n_new} never-verified, "
          f"{len(window)} total):")
    print("WINDOW_PRIORITY: list[str] = [")
    for n in window:
        tag = "" if n in greens else "  # never driver-verified"
        print(f'    "{n}",{tag}')
    print("]")


if __name__ == "__main__":
    main()
