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

Usage:
  python tools/bench_guard.py /tmp/bench_new.json            # vs HEAD
  python tools/bench_guard.py new.json --ref <git-rev>       # vs rev
Exit code 0 = clean, 1 = contaminated (re-run before committing).
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys


def committed_record(rev: str) -> dict:
    out = subprocess.run(
        ["git", "show", f"{rev}:BENCH_full_latest.json"],
        capture_output=True, text=True, check=True,
    ).stdout
    return json.loads(out)


def main() -> int:
    args = sys.argv[1:]
    if not args:
        print(__doc__)
        return 2
    new = json.load(open(args[0]))
    rev = args[args.index("--ref") + 1] if "--ref" in args else "HEAD"
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
    print(json.dumps({
        "verdict": verdict,
        "median_ratio": round(med, 3),
        "n_compared": len(ratios),
        "n_outliers_3x": len(outliers),
        "worst": sorted(outliers, reverse=True)[:8],
        "headline_new": new["value"],
        "headline_ref": ref["value"],
        "ref_rev": rev,
    }))
    return 0 if verdict == "CLEAN" else 1


if __name__ == "__main__":
    raise SystemExit(main())
