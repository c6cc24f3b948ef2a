"""Unit-pin bench_guard's straggler classification and record bar
(pure Python, no Spark): the list that gates a record commit is
'stragglers' (median poisoned — the round-10 incident shape), not every
big within-run spread (structural first-repeat fixture costs are
'spready_ok'); entries with no committed reference are 'spready_new'
(visibly unvetted — round-11 advice); and with --record, ANY 3x outlier
or straggler fails the run (round-11 verdict: the spread rule cannot
see a disturbance covering all three repeats uniformly)."""

import importlib.util
import os


def _guard():
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_guard", os.path.join(repo_root, "tools", "bench_guard.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_classify_spreads_partitions_poisoned_from_benign():
    g = _guard()
    spreads = {
        # the round-10 incident shape: spread huge AND median 10x ref
        "poisoned": 33.0,
        # structural fixture spread: big spread, healthy median
        "benign_fixture": 3.8,
        # spread below the 2s floor: not flagged at all
        "quiet": 1.5,
        # spread > 2s but NOT > its own median: not flagged
        "long_query": 5.0,
        # new query with no ref row: flagged, UNVETTED (spready_new)
        "new_query": 4.0,
    }
    new = {
        "poisoned": 12.97,
        "benign_fixture": 0.68,
        "quiet": 0.4,
        "long_query": 8.0,
        "new_query": 2.0,
    }
    ref = {
        "poisoned": 1.2,
        "benign_fixture": 0.66,
        "quiet": 0.4,
        "long_query": 7.5,
    }
    stragglers, spready_ok, spready_new = g.classify_spreads(
        spreads, new, ref)
    assert [r[1] for r in stragglers] == ["poisoned"]
    assert [r[1] for r in spready_ok] == ["benign_fixture"]
    # round-11 advice: a first-record-run spread entry must be visibly
    # unvetted, not silently routed into the benign list
    assert [r[1] for r in spready_new] == ["new_query"]


def test_classify_spreads_poison_needs_absolute_delta():
    g = _guard()
    # 2x the ref but only 0.4s absolute: short-query noise, not poison
    stragglers, spready_ok, spready_new = g.classify_spreads(
        {"short": 2.5}, {"short": 0.8}, {"short": 0.35})
    assert stragglers == []
    assert [r[1] for r in spready_ok] == ["short"]
    assert spready_new == []


def test_classify_spreads_none_means_unmeasured():
    g = _guard()
    stragglers, spready_ok, spready_new = g.classify_spreads(
        None, {"a": 1.0}, {"a": 1.0})
    assert stragglers == [] and spready_ok == [] and spready_new == []


def test_record_bar_fails_on_any_outlier():
    g = _guard()
    # the round-11 incident: 2 uniform-elevation outliers, 0 stragglers
    ok, reasons = g.record_bar(2, 0)
    assert not ok and any("outlier" in r for r in reasons)


def test_record_bar_fails_on_any_straggler_or_missing_spreads():
    g = _guard()
    ok, reasons = g.record_bar(0, 1)
    assert not ok and any("straggler" in r for r in reasons)
    # a record candidate without spreads is not auditable
    ok, reasons = g.record_bar(0, None)
    assert not ok and any("spreads" in r for r in reasons)


def test_record_bar_passes_clean():
    g = _guard()
    ok, reasons = g.record_bar(0, 0)
    assert ok and reasons == []
