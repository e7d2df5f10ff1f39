"""Focused tests for the round-6 conflict-resolver internals: the
single-pass bounded dup-key collect (guide §2.4 — pass 2 used to re-run
the whole groupBy as its broadcast build side) must keep the cascade
semantics and the adversarial-input guard bit-identical."""

import pytest

from sqlite_otel_spark.operators.conflicts import (
    ConflictOverflowError,
    drop_conflicted,
    resolve_span_conflicts,
)

SPAN_SCHEMA = (
    "rec_kind string, conv_id string, turn_idx int, trace_id string, span_id string"
)


def span_records(spark, rows):
    return spark.createDataFrame(
        [("span", *r) for r in rows], schema=SPAN_SCHEMA
    )


def test_no_duplicates_short_circuits(spark):
    recs = span_records(spark, [("c1", 0, "t1", "s1"), ("c1", 1, "t2", "s2")])
    invalid, n = resolve_span_conflicts(spark, recs, 100)
    assert invalid is None and n == 0


def test_sequential_cascade_matches_reference_order(spark):
    # turn A commits X; turn B carries X and Y -> rejected entirely;
    # turn C carries Y -> accepted because B never committed.
    recs = span_records(
        spark,
        [
            ("c1", 0, "tX", "sX"),
            ("c1", 1, "tX", "sX"),
            ("c1", 1, "tY", "sY"),
            ("c1", 2, "tY", "sY"),
        ],
    )
    invalid, n = resolve_span_conflicts(spark, recs, 100)
    assert n == 1
    assert [(r.conv_id, r.turn_idx) for r in invalid.collect()] == [("c1", 1)]
    kept = drop_conflicted(recs, invalid)
    assert sorted(r.turn_idx for r in kept.collect()) == [0, 2]


def test_invalid_relation_is_single_partition(spark):
    # the tiny invalid set is broadcast-built repeatedly downstream;
    # the default-parallelism layout cost one scheduled task per
    # partition per build (round-6 stage profile)
    recs = span_records(spark, [("c1", 0, "tX", "sX"), ("c1", 1, "tX", "sX")])
    invalid, n = resolve_span_conflicts(spark, recs, 100)
    assert n == 1
    assert invalid.rdd.getNumPartitions() == 1


def test_overflow_guard_on_key_count(spark):
    rows = []
    for i in range(12):  # 12 duplicated keys > cap 10
        rows += [(f"c{i}", 0, f"t{i}", "s"), (f"c{i}", 1, f"t{i}", "s")]
    recs = span_records(spark, rows)
    with pytest.raises(ConflictOverflowError):
        resolve_span_conflicts(spark, recs, 10)


def test_overflow_guard_on_pair_count(spark):
    # ONE hot key duplicated past the cap: few keys, many pairs — the
    # n_pairs arm of the guard must still fire before pass 2
    rows = [(f"c{i}", i, "thot", "shot") for i in range(12)]
    recs = span_records(spark, rows)
    with pytest.raises(ConflictOverflowError):
        resolve_span_conflicts(spark, recs, 10)


def test_locally_failed_turns_excluded(spark):
    # non-span rows never participate in the cascade
    recs = spark.createDataFrame(
        [
            ("span", "c1", 0, "t1", "s1"),
            ("log", "c1", 1, "t1", "s1"),  # same key, but a log row
        ],
        schema=SPAN_SCHEMA,
    )
    invalid, n = resolve_span_conflicts(spark, recs, 100)
    assert invalid is None and n == 0
