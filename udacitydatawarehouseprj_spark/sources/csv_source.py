"""CSV ingestion — the third COPY-style source format (alongside the
reference's two JSON paths, sql_queries.py:138-150): explicit schema,
header handling, PERMISSIVE malformed-row capture.

Same design rules as json_source: the schema is DECLARED, never inferred
(inference is a full extra pass over 100 TB and can silently flip types
between loads); malformed rows land in a corrupt-record column instead of
killing the load, so a bad batch is quarantined by filter, not by rerun.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: flat event-log layout for CSV interchange: fixed-width/int-exact
#: columns plus one double; timestamps travel as epoch millis (CSV has no
#: type system — a textual timestamp would re-enter via parser settings,
#: epoch longs re-enter exactly)
EVENTS_CSV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ts_ms", T.LongType()),
    ]
)


def read_events_csv(
    spark: SparkSession,
    path: str,
    corrupt_col: str | None = "_corrupt_record",
) -> DataFrame:
    """Read an events CSV drop with the declared schema.

    PERMISSIVE + corrupt-record capture when ``corrupt_col`` is set;
    doubles survive the text round-trip exactly because Spark writes
    shortest-roundtrip decimal strings and reads them back with
    correctly-rounded parsing.
    """
    schema = EVENTS_CSV_SCHEMA
    reader = (
        spark.read.option("header", "true")
        .option("mode", "PERMISSIVE")
    )
    if corrupt_col:
        schema = T.StructType(
            schema.fields + [T.StructField(corrupt_col, T.StringType())]
        )
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    return reader.schema(schema).csv(path)
