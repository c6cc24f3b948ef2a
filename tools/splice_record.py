"""Splice isolated-probe values into a bench record candidate.

The record-splice discipline (tools/bench_guard.py --record): when a
record candidate fails the bar on specific queries (3× outliers /
stragglers / unvetted spready_new), each flagged query is re-measured
in a fresh quiesced process (tools/isolated_probe.py). If the probe
agrees with the prior record, the candidate's value was box poison and
the probe's HONEST value replaces it.

Round-12 advice fixed here: the round-12 splice replaced 8 medians but
left the rejected run's spreads in place (tpch_q2_min_cost_supplier:
spliced median 1.445 with retained spread 5.065 — a pair
classify_spreads would flag against its own row), so median/spread
pairs in the committed record were mixed-provenance. This tool splices
the probe's median AND spread as a unit, and moves the rejected values
into the candidate's "spliced" audit block alongside the probe's raw
runs and anchor.

Usage:
  python tools/isolated_probe.py QUERY > /tmp/probe_QUERY.json
  python tools/splice_record.py CANDIDATE.json /tmp/probe_*.json
  # rewrites CANDIDATE.json in place; --out PATH writes elsewhere

Each probe JSON must be an isolated_probe.py output line ({"query": ..,
"median": .., "spread": .., "runs": [..], "anchor_sec": ..}).

``--allow-new`` (round 13): the record/ledger split seeded
``BENCH_record.json`` from the last clean run (f97ff0a), which predates
queries added in later waves — those names have NO row to replace, so a
plain splice refuses them (for a full-run candidate a missing name is a
typo, and that stays an error). With ``--allow-new`` a missing name is
ADDED from the probe, with ``"added": true`` and a null rejected_median
in the audit block, so the record covers every registry name and the
guard never reports a permanent spready_new for post-seed queries.
"""

from __future__ import annotations

import json
import sys


def splice(candidate: dict, probes: list[dict],
           allow_new: bool = False) -> dict:
    """Return a new candidate dict with each probe's median+spread
    spliced in and the rejected values preserved under "spliced".
    With ``allow_new``, probes for names absent from the candidate are
    ADDED (audit row carries ``"added": true`` and null rejecteds)."""
    out = dict(candidate)
    out["queries"] = dict(candidate["queries"])
    out["spreads"] = dict(candidate.get("spreads") or {})
    audit = dict(candidate.get("spliced") or {})
    for p in probes:
        name = p["query"]
        if name not in out["queries"] and not allow_new:
            raise SystemExit(f"probe query {name!r} not in candidate "
                             "(pass --allow-new to add post-seed names)")
        audit[name] = {
            "rejected_median": out["queries"].get(name),
            "rejected_spread": out["spreads"].get(name),
            "probe_runs": p["runs"],
            "probe_anchor_sec": p.get("anchor_sec"),
        }
        if name not in out["queries"]:
            audit[name]["added"] = True
        out["queries"][name] = p["median"]
        out["spreads"][name] = p["spread"]
    out["spliced"] = audit
    return out


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(args) < 2:
        print(__doc__)
        return 2
    out_path = args[0]
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    candidate = json.load(open(args[0]))
    probes = [json.load(open(p)) for p in args[1:]]
    result = splice(candidate, probes, allow_new="--allow-new" in sys.argv)
    with open(out_path, "w", encoding="utf-8") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
    print(json.dumps({
        "spliced": sorted(
            p["query"] for p in probes),
        "out": out_path,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
