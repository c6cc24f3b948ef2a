"""Unit-pin bench_guard's straggler classification (pure Python, no
Spark): the list that gates a record commit is 'stragglers' (median
poisoned — the round-10 incident shape), not every big within-run
spread (structural first-repeat fixture costs are 'spready_ok')."""

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
        # new query with no ref row: flagged but cannot be 'poisoned'
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
    stragglers, spready = g.classify_spreads(spreads, new, ref)
    assert [r[1] for r in stragglers] == ["poisoned"]
    assert [r[1] for r in spready] == ["new_query", "benign_fixture"]


def test_classify_spreads_poison_needs_absolute_delta():
    g = _guard()
    # 2x the ref but only 0.4s absolute: short-query noise, not poison
    stragglers, spready = g.classify_spreads(
        {"short": 2.5}, {"short": 0.8}, {"short": 0.35})
    assert stragglers == []
    assert [r[1] for r in spready] == ["short"]


def test_classify_spreads_none_means_unmeasured():
    g = _guard()
    stragglers, spready = g.classify_spreads(None, {"a": 1.0}, {"a": 1.0})
    assert stragglers == [] and spready == []
