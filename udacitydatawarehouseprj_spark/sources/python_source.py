"""Custom Python DataSource (the Spark 4 DataSource API) — the
source-plane extension point beside the file formats (parquet / JSON /
CSV / ORC) and the streaming sources.

``synthcorpus`` is a deterministic synthetic-corpus generator exposed
as a first-class table source: `spark.read.format("synthcorpus")`.
It demonstrates the three capabilities a production Python source
(a REST paginator, a proprietary binary format, a feature store)
needs:

* **partition planning** — `partitions()` splits the id range into
  `partitions` independent splits, so reads scale out exactly like a
  file scan (one task per split, no driver bottleneck);
* **Arrow-batch reads** — `read()` yields `pyarrow.RecordBatch`, the
  vectorized path (row-tuple yields are the slow path by ~10-100×);
* **filter pushdown** — `pushFilters()` consumes range predicates on
  `doc_id` and narrows the GENERATED range, so `partitions()` plans
  splits only for surviving ids (the Python-source analogue of
  parquet predicate pushdown — the skipped rows are never produced at
  all). Unsupported filters are returned for Spark to re-apply.

Row content is the portable two-round Lehmer hash family
(mod 999999937 — exact BIGINT on any engine), so a SQL oracle replays
every generated value bit-for-bit: even the SOURCE is under the
driver's hash gate.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
)

#: portable PRNG constants (shared with the bootstrap / CMS family)
MOD = 999_999_937
MULT = 48_271
OFFSET = 12_345
N_GROUPS = 37


@dataclass
class IdRangePartition(InputPartition):
    start: int
    end: int


def score_of(ids):
    """Vectorized portable score in [0, 1): two Lehmer rounds (one
    round leaves small ids far below the modulus — the bootstrap
    lesson), then one exact IEEE division."""
    h1 = ((ids % MOD) * MULT + OFFSET) % MOD
    h2 = (h1 * MULT) % MOD
    return h2 / float(MOD)


class SynthCorpusReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n_rows", 10_000))
        self.num_parts = int(options.get("partitions", 8))
        self.lo = 0
        self.hi = self.n

    def pushFilters(self, filters):
        for f in filters:
            if isinstance(f, GreaterThanOrEqual) and f.attribute == ("doc_id",):
                self.lo = max(self.lo, int(f.value))
            elif isinstance(f, GreaterThan) and f.attribute == ("doc_id",):
                self.lo = max(self.lo, int(f.value) + 1)
            elif isinstance(f, LessThan) and f.attribute == ("doc_id",):
                self.hi = min(self.hi, int(f.value))
            elif isinstance(f, LessThanOrEqual) and f.attribute == ("doc_id",):
                self.hi = min(self.hi, int(f.value) + 1)
            elif isinstance(f, IsNotNull):
                pass  # generated columns are never null — trivially pushed
            else:
                yield f  # unsupported: Spark re-applies it after the scan

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        if hi <= lo:
            return [IdRangePartition(lo, lo)]
        span = -(-(hi - lo) // self.num_parts)
        return [
            IdRangePartition(s, min(s + span, hi))
            for s in range(lo, hi, span)
        ]

    def read(self, partition):
        import numpy as np
        import pyarrow as pa

        ids = np.arange(partition.start, partition.end, dtype="int64")
        if len(ids):
            yield pa.record_batch(
                [
                    pa.array(ids),
                    pa.array(ids % N_GROUPS),
                    pa.array(score_of(ids)),
                ],
                names=["doc_id", "group_key", "score"],
            )


class SynthCorpusDataSource(DataSource):
    @classmethod
    def name(cls):
        return "synthcorpus"

    def schema(self):
        return "doc_id bigint, group_key bigint, score double"

    def reader(self, schema):
        return SynthCorpusReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the synthcorpus format."""
    spark.dataSource.register(SynthCorpusDataSource)
