"""Unit tests for the custom Python DataSource (sources/python_source)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    GreaterThanOrEqual,
    LessThan,
    StringContains,
)

from udacitydatawarehouseprj_spark.sources import python_source as ps


def _reader(**opts):
    return ps.SynthCorpusReader({k: str(v) for k, v in opts.items()})


def test_push_filters_narrows_partition_planning():
    r = _reader(n_rows=10000, partitions=8)
    leftover = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("doc_id",), 6000),
                LessThan(("doc_id",), 9000),
                StringContains(("group_key",), "x"),  # unsupported
            ]
        )
    )
    # the unsupported filter is handed back for Spark to re-apply
    assert len(leftover) == 1 and isinstance(leftover[0], StringContains)
    parts = r.partitions()
    assert parts[0].start == 6000 and parts[-1].end == 9000
    covered = sum(p.end - p.start for p in parts)
    assert covered == 3000  # skipped ids are never planned, let alone read


def test_partitions_cover_range_disjointly():
    r = _reader(n_rows=1000, partitions=7)
    parts = r.partitions()
    spans = sorted((p.start, p.end) for p in parts)
    assert spans[0][0] == 0 and spans[-1][1] == 1000
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 == s2  # no gaps, no overlaps


def test_empty_range_yields_no_rows(spark):
    ps.register(spark)
    df = (
        spark.read.format("synthcorpus")
        .option("n_rows", 100)
        .load()
        .filter(F.col("doc_id") >= 1000)
    )
    assert df.count() == 0


def test_scan_values_match_formula(spark):
    ps.register(spark)
    rows = (
        spark.read.format("synthcorpus")
        .option("n_rows", 200)
        .option("partitions", 4)
        .load()
        .collect()
    )
    assert len(rows) == 200
    import numpy as np

    ids = np.array([r.doc_id for r in rows])
    scores = np.array([r.score for r in rows])
    assert (np.sort(ids) == np.arange(200)).all()
    order = np.argsort(ids)
    assert np.array_equal(scores[order], ps.score_of(np.arange(200)))
    for r in rows[:10]:
        assert r.group_key == r.doc_id % ps.N_GROUPS
