"""Per-query diff of two bench reports.

The driver truncates BENCH_rN.json to its tail, so older rounds often
lack the full per-query map; bench.py therefore also writes
BENCH_full_latest.json (committed per round as the diffable record).
This tool compares any two bench JSON files — full or truncated — and
prints the queries whose time moved more than a threshold, plus
added/removed queries.

Usage:
    python tools/bench_diff.py OLD.json NEW.json [--min-delta 0.3]

A truncated file (driver tail) is rescued by scanning for the last
complete {"metric": ...} object; if none parses, whatever per-query
'"name": sec' pairs survive in the tail are used.
"""

from __future__ import annotations

import json
import re
import sys


def load_queries(path: str) -> dict[str, float]:
    raw = open(path, encoding="utf-8").read()
    try:
        d = json.loads(raw)
        if "queries" in d:
            return dict(d["queries"])
        # driver wrapper: {"rc": ..., "tail": "<escaped json tail>"}
        raw = d.get("tail", "")
    except json.JSONDecodeError:
        pass
    # tail-truncated / escaped: salvage '"name": sec' pairs
    pairs = re.findall(r'\\?"([A-Za-z0-9_]+)\\?":\s*([0-9]+\.[0-9]+)', raw)
    return {
        k: float(v)
        for k, v in pairs
        if k not in {"value", "sf", "value_all"} and not k.startswith("value_")
    }


def main() -> None:
    min_delta = 0.3
    args: list[str] = []
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--min-delta":
            min_delta = float(next(it))
        else:
            args.append(a)
    if len(args) != 2:
        print(__doc__)
        sys.exit(2)
    old, new = load_queries(args[0]), load_queries(args[1])
    moved = []
    for name in sorted(set(old) & set(new)):
        d = new[name] - old[name]
        if abs(d) >= min_delta:
            moved.append((d, name))
    moved.sort(reverse=True)
    print(f"# {args[0]} ({len(old)} q) -> {args[1]} ({len(new)} q), "
          f"|delta| >= {min_delta}s")
    for d, name in moved:
        sign = "+" if d > 0 else ""
        print(f"{sign}{d:7.3f}s  {name}  ({old[name]} -> {new[name]})")
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print(f"# added ({len(added)}): " + ", ".join(added))
    if removed:
        print(f"# removed ({len(removed)}): " + ", ".join(removed))
    both = set(old) & set(new)
    if both:
        t_old = sum(old[n] for n in both)
        t_new = sum(new[n] for n in both)
        print(f"# overlapping total: {t_old:.1f}s -> {t_new:.1f}s "
              f"({(t_new - t_old) / t_old * 100:+.1f}%)")


if __name__ == "__main__":
    main()
