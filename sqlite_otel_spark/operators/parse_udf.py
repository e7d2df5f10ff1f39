"""P1: the Arrow-vectorized parse stage (SURVEY §2.3, §2.9).

The reference decodes each HTTP body with a streaming JSON decoder on its
own goroutine (handlers/handler_common.go:33-45). Here the unit of work
is an Arrow batch of transcript turns shipped to a Python worker; the
per-turn validation/flatten/projection semantics live in the pure
function ``parse_turn`` so they are unit-testable without Spark and
shared with nothing else (the oracle is an independent implementation).

Scale notes:
 - this is the only Python stage in the hot path; everything downstream
   (explode, cast, dedup, joins, aggregations) is JVM/codegen;
 - batch size is governed by spark.sql.execution.arrow.maxRecordsPerBatch;
 - the UDF short-circuits empty/oversize/non-JSON rows before json
   decoding, which is why the F1-F4 guards don't need a separate
   pre-filter pass (single scan, same early-fail ordering as
   handler_common.go:15-45).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf

from sqlite_otel_spark.functions.parse import PARSED_SCHEMA, parse_turn

_FIELDS = [f.name for f in PARSED_SCHEMA.fields]


def make_parse_udf(max_text_bytes: int = 10 * 1024 * 1024):
    """Build the parse pandas UDF with the F3 size cap baked in
    (handlers/handler_common.go:29)."""

    @pandas_udf(PARSED_SCHEMA)
    def parse(texts: pd.Series) -> pd.DataFrame:
        records = [parse_turn(t, max_text_bytes) for t in texts]
        return pd.DataFrame.from_records(records, columns=_FIELDS)

    return parse


def with_parsed(df, max_text_bytes: int = 10 * 1024 * 1024, col: str = "parsed"):
    """transcripts -> transcripts + ``parsed`` struct column."""
    return df.withColumn(col, make_parse_udf(max_text_bytes)(F.col("text")))
