"""Regenerate the golden VALUES oracles embedded in
sqlite_otel_spark/queries.py (pipeline_sink_counts, pipeline_accounting,
pipeline_by_signal_tool, pipeline_time_rollup) from the sequential
oracle at the fixture scale. Run after any fixture change and paste the
printed SQL into queries.py."""

from collections import Counter

from sqlite_otel_spark.fixtures import make_transcripts
from sqlite_otel_spark.oracle import OracleDB
from sqlite_otel_spark.queries import FIXTURE_N, FIXTURE_SEED

db = OracleDB().run(make_transcripts(FIXTURE_N, seed=FIXTURE_SEED))

print("-- pipeline_sink_counts")
print("SELECT * FROM (VALUES")
print(",\n".join(f"    ('{k}', CAST({v} AS BIGINT))" for k, v in db.sink_counts().items()))
print(") AS t(sink, n_rows)")

acc, accb, rej = Counter(), Counter(), Counter()
for a in db.accepted:
    acc[a["signal_type"]] += 1
    accb[a["signal_type"]] += a["n_bytes"]
for r in db.rejects:
    rej[r["signal_type"]] += 1

print("\n-- pipeline_accounting")
print("SELECT * FROM (VALUES")
print(",\n".join(
    f"    ('{s}', CAST({acc[s]} AS BIGINT), CAST({accb[s]} AS BIGINT), CAST({rej[s]} AS BIGINT))"
    for s in ("trace", "log", "metric")
))
print(") AS t(signal_type, accepted, accepted_bytes, rejected)")

by_tool = Counter()
by_bucket = Counter()
for a in db.accepted:
    by_tool[(a["signal_type"], a["tool"])] += 1
    b = a["ts"].replace(minute=0, second=0, microsecond=0)
    by_bucket[(b, a["signal_type"], a["tool"])] += 1

print("\n-- pipeline_by_signal_tool")
print("SELECT * FROM (VALUES")
print(",\n".join(
    f"    ('{s}', '{t}', CAST({n} AS BIGINT))"
    for (s, t), n in sorted(by_tool.items())
))
print(") AS t(signal_type, tool, n_turns)")

print("\n-- pipeline_time_rollup")
print("SELECT * FROM (VALUES")
print(",\n".join(
    f"    (TIMESTAMP '{b:%Y-%m-%d %H:%M:%S}', '{s}', '{t}', CAST({n} AS BIGINT))"
    for (b, s, t), n in sorted(by_bucket.items())
))
print(") AS t(bucket_start, signal_type, tool, n_turns)")
