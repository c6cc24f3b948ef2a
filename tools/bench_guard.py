"""Bench contamination guard — validate a fresh bench report against
the committed record BEFORE committing it.

Round-8 lesson: a full bench started on an apparently-idle box (0 java
processes) recorded headline 103 s vs the 25.5 s committed record —
median per-query ratio 1.19 with 5-10× outliers and huge min-max
spreads. A rerun 30 minutes later scored 27.9 s at median ratio 1.05.
Box-level contamination is not always visible in `ps`; the committed
record is the reliable reference.

Verdict rules (tuned to the repo's measured noise band, ±15%):
  CONTAMINATED if median per-query ratio > 1.15, or if more than 2%
  of queries regress > 3× (with >0.5 s absolute delta).
  Otherwise CLEAN.

Round-10 lesson (stragglers): a run can pass both verdict rules while
a mid-run host disturbance poisons a handful of entries — the round-10
record's first accepted run was CLEAN at median ratio 1.025 yet carried
4 entries whose min–max spread across the 3 repeats was 2.5–33 s
(disturbance longer than all three back-to-back repeats, so the median
couldn't mask it). The guard now also reports "stragglers": queries
whose within-run spread exceeds both 2 s and their own median — their
medians are untrustworthy as references. A CLEAN verdict with a
non-empty straggler list means: prefer a re-run; if the box won't
produce a straggler-free run (noisy-neighbor day), commit with the
stragglers named in the commit message. Spreads come from the new
report if present, else from ./BENCH_full_latest.json (written by the
same bench.py invocation).

Round-11 refinement: an isolated-session A/B showed a handful of
queries carry STRUCTURAL first-repeat spread every run (fixture costs:
Python data-source registration, LSH pair-cache build, sink write —
2–7 s spread in a quiesced fresh session with a healthy median), so
"empty spread list" is unreachable on any run and the spread flag alone
over-warns. The list that must be empty is "stragglers" — spread-
flagged entries whose MEDIAN is also poisoned (> 2× the committed
record with > 1 s absolute delta, the round-10 incident's shape:
12.97 s recorded vs ~1.2 s true). Spread-flagged entries with healthy
medians are reported separately as "spready_ok": the median-of-3
absorbed a slow repeat, which is what the median is for. Spread-flagged
entries with NO committed reference (a brand-new query's first record
run) are reported as "spready_new" — visibly unvetted, neither benign
nor condemned (round-11 advice: routing them into spready_ok hid the
one case the record has no defense against).

Round-12 refinement (--record mode): the round-11 record passed the
straggler rule yet carried 2 UNIFORMLY-elevated medians (disturbance
covering all three back-to-back repeats: pagerank_similarity_graph
10.17 s vs ~3.4 s true by three independent measures) — a class the
spread rule structurally cannot see. A record-candidate must therefore
clear a stricter bar than an informational check: with --record, ANY
3× outlier (not just > 2% of queries) and ANY straggler fails the run.
The discipline for a failed --record check: re-run each flagged query
in an ISOLATED session (fresh process, quiesced box); if the re-run
agrees with the prior record, splice the honest value into the
candidate before committing; if it agrees with the candidate, the
change is real — accept it and say so in the commit message.

The new report's "anchor" block (bench.py times a fixed cheap query
first and last) is echoed with its drift ratio — a drift > 1.5×
means the box state degraded DURING the run and late-bucket medians
are suspect even if every other rule passes.

If the new report lacks "spreads", they are recovered from
BENCH_full_latest.json at the REPO ROOT (resolved from this script's
location, regardless of CWD) when that file records the same run.

Usage:
  python tools/bench_guard.py /tmp/bench_new.json            # vs HEAD
  python tools/bench_guard.py new.json --ref <git-rev>       # vs rev
  python tools/bench_guard.py new.json --record              # record bar
Exit code 0 = clean, 1 = contaminated / record-bar failure.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys


def committed_record(rev: str) -> dict:
    out = subprocess.run(
        ["git", "show", f"{rev}:BENCH_full_latest.json"],
        capture_output=True, text=True, check=True,
    ).stdout
    return json.loads(out)


def classify_spreads(spreads, new_queries, ref_queries):
    """Partition spread-flagged queries (within-run spread > 2 s and >
    the query's own median) into ``stragglers`` — median ALSO poisoned
    (> 2× the committed record with > 1 s absolute delta, the round-10
    incident shape; must be EMPTY before a run becomes the record) —
    ``spready_ok`` — a slow repeat the median absorbed (structural
    first-repeat fixture costs land here) — and ``spready_new`` —
    no committed reference exists (a query's FIRST record run), so the
    median is UNVETTED: eyeball it before committing, it can never be
    auto-cleared (round-11 advice). Rows are
    (spread, name, new_median, ref_median), largest spread first."""
    stragglers = []
    spready_ok = []
    spready_new = []
    if spreads is None:
        return stragglers, spready_ok, spready_new
    for name, s in sorted(
        spreads.items(), key=lambda kv: kv[1], reverse=True
    ):
        q_med = new_queries.get(name, float("inf"))
        if not (s > 2.0 and s > q_med):
            continue
        rt = ref_queries.get(name)
        row = (round(s, 2), name, q_med, rt)
        if rt is None:
            spready_new.append(row)
        elif q_med > 2.0 * rt and q_med - rt > 1.0:
            stragglers.append(row)
        else:
            spready_ok.append(row)
    return stragglers, spready_ok, spready_new


def record_bar(n_outliers: int, n_stragglers) -> tuple[bool, list[str]]:
    """The stricter bar a record-candidate must clear (--record):
    ZERO 3× outliers and ZERO stragglers. Returns (ok, reasons).
    ``n_stragglers`` may be None (no spreads available) — that is a
    failure too: a record must carry its spreads."""
    reasons = []
    if n_outliers > 0:
        reasons.append(
            f"{n_outliers} outlier(s) >3x the committed record — re-run "
            "each in an isolated session; splice the honest value if the "
            "re-run agrees with the prior record")
    if n_stragglers is None:
        reasons.append("no spreads available — a record needs its spreads")
    elif n_stragglers > 0:
        reasons.append(f"{n_stragglers} straggler(s) with poisoned medians")
    return not reasons, reasons


def main() -> int:
    args = sys.argv[1:]
    if not args:
        print(__doc__)
        return 2
    new = json.load(open(args[0]))
    rev = args[args.index("--ref") + 1] if "--ref" in args else "HEAD"
    record_mode = "--record" in args
    ref = committed_record(rev)

    ratios = []
    outliers = []
    for name, t in new["queries"].items():
        rt = ref["queries"].get(name)
        if rt is None or rt <= 0.1:
            continue
        ratios.append(t / rt)
        if t / rt > 3.0 and t - rt > 0.5:
            outliers.append((round(t / rt, 1), name, rt, t))
    med = statistics.median(ratios)
    frac_out = len(outliers) / max(len(ratios), 1)
    verdict = "CLEAN"
    if med > 1.15 or frac_out > 0.02:
        verdict = "CONTAMINATED"

    spreads = new.get("spreads")
    if spreads is None:
        try:
            repo_root = os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))
            full = json.load(
                open(os.path.join(repo_root, "BENCH_full_latest.json")))
            # only trust the side file if it is the same run
            if full.get("queries") == new.get("queries"):
                spreads = full.get("spreads")
        except Exception:
            pass
    stragglers, spready_ok, spready_new = classify_spreads(
        spreads, new["queries"], ref["queries"]
    )

    anchor = new.get("anchor")
    if record_mode:
        record_ok, record_reasons = record_bar(
            len(outliers), len(stragglers) if spreads is not None else None)
        if not record_ok:
            verdict = "RECORD-BAR-FAIL"
    else:
        record_ok, record_reasons = None, []

    print(json.dumps({
        "verdict": verdict,
        "median_ratio": round(med, 3),
        "n_compared": len(ratios),
        "n_outliers_3x": len(outliers),
        "worst": sorted(outliers, reverse=True)[:8],
        "n_stragglers": len(stragglers) if spreads is not None else None,
        "stragglers": stragglers[:8],
        "n_spready_ok": len(spready_ok) if spreads is not None else None,
        "spready_ok": spready_ok[:8],
        "n_spready_new": len(spready_new) if spreads is not None else None,
        "spready_new": spready_new[:8],
        "anchor": anchor,
        "anchor_drift": anchor.get("drift_ratio") if anchor else None,
        "record_mode": record_mode,
        "record_reasons": record_reasons,
        "headline_new": new["value"],
        "headline_ref": ref["value"],
        "ref_rev": rev,
    }))
    if anchor and (anchor.get("drift_ratio") or 0) > 1.5:
        print(f"WARNING: anchor drift {anchor['drift_ratio']}x — box state "
              "degraded during the run; late-bucket medians suspect",
              file=sys.stderr)
    return 0 if verdict == "CLEAN" else 1


if __name__ == "__main__":
    raise SystemExit(main())
