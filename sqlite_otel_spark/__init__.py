"""sqlite_otel_spark — a from-scratch PySpark-native telemetry pipeline.

Re-expresses the capabilities of the reference Go collector
(RedShiftVelocity/sqlite-otel: OTLP/HTTP -> SQLite) as an idiomatic Spark
DAG over a table of multi-turn agent transcripts:

    parse (Arrow-vectorized UDF) -> enrich (broadcast dims) -> route
    (signal fan-out) -> sinks (six-table star schema) -> aggregates.

Blueprint: /root/repo/SURVEY.md.  The reference is cited by file:line in
docstrings for parity checking; no reference code is copied (different
language, different execution model).
"""

__version__ = "0.1.0"
