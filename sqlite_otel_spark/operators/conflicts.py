"""D4: global spans PRIMARY KEY semantics across turns (SURVEY §2.4, §7c).

The reference enforces PRIMARY KEY(trace_id, span_id) in SQLite
(database/db.go:95): a turn whose span collides with an EARLIER COMMITTED
span fails entirely (transaction rollback), which can in turn free keys
for later turns — a sequential cascade:

    turn A commits span X
    turn B carries X and Y -> rejected (X taken); Y never commits
    turn C carries Y        -> accepted (B never committed)

Distributed resolution: only turns that contain a *globally duplicated*
key can be affected (keys unique to one turn can never collide). Those
turns are a vanishing fraction of real telemetry (duplicate span ids are
pathological), so a counts-only aggregation over the pruned span-key
projection finds the duplicated keys first and enforces the hard cap,
then a semi-join collects the (turn, key) pairs — provably bounded by
the cap — and the driver replays the sequential commit order over just
those pairs. The verdict set is broadcast back as an anti-join.
Exceeding the cap means the input is adversarial and the job fails
loudly (before any oversized group materializes on an executor or any
wide row reaches the driver) rather than OOMing.

Canonical arrival order is (conv_id, turn_idx) — the graft's stable
ordering invariant (BASELINE.json input_hint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ConflictOverflowError(RuntimeError):
    pass


def resolve_span_conflicts(
    spark: SparkSession, records: DataFrame, max_conflict_turns: int = 100_000
) -> tuple[DataFrame | None, int]:
    """Return (invalid_turns_df | None, n_invalid) — turns rejected by the
    cross-turn spans PK cascade. ``records`` is the flat record stream
    (operators/records.py); locally-failed turns emitted no span rows and
    are transparently excluded. Two jobs over the pruned
    (conv_id, turn_idx, trace_id, span_id) projection: a counts-only agg
    that enforces the cap, then a bounded semi-join collect (the dup set
    is near-empty in sane inputs)."""
    span_keys = records.filter(F.col("rec_kind") == "span").select(
        "conv_id", "turn_idx", "trace_id", "span_id"
    )
    # Pass 1 — duplicated keys via ONE partial+final count agg, fetched
    # with a LIMIT of cap+1 rows: the adversarial-input guard fires
    # BEFORE any per-key list materializes on an executor or any wide
    # row reaches the driver (a hot key under collect_list would
    # otherwise buffer its whole group first), and cap+1 bounds the
    # collect no matter how many keys are duplicated. Round 6 (guide
    # §2.4): the previous counts-only stats pass threw the dup-key rows
    # away, so pass 2 RE-RAN the whole groupBy from the cache as its
    # broadcast build side (~27 core-s + one extra job at 3M turns);
    # collecting the (bounded) keys here lets pass 2 probe a local
    # relation instead.
    dup_q = (
        span_keys.groupBy("trace_id", "span_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .limit(max_conflict_turns + 1)
    )
    # Single-shot take: the default executeTake starts at 1 partition
    # and scales up 4x per wave, re-running the final agg as 3-4
    # SEQUENTIAL jobs whose scheduling latency exceeds the saved work
    # (measured 2.3 s -> 5.4 s at 3M turns). Covering every partition in
    # wave 1 keeps this one job; the map-side agg ran once either way.
    conf = spark.conf
    key = "spark.sql.limit.initialNumPartitions"
    prev = conf.get(key, None)
    try:
        conf.set(key, str(1 << 20))
        dup_rows = dup_q.collect()
    finally:
        if prev is None:
            conf.unset(key)
        else:
            conf.set(key, prev)
    if not dup_rows:
        return None, 0
    n_pairs = sum(r.n for r in dup_rows)
    if len(dup_rows) > max_conflict_turns or n_pairs > max_conflict_turns:
        raise ConflictOverflowError(
            f"more than {max_conflict_turns} span-PK-conflicting turn/key pairs; "
            "input looks adversarial (duplicate trace/span ids at scale)"
        )
    # Pass 2 — now provably bounded (n_pairs <= max_conflict_turns rows):
    # probe the pruned projection for the duplicated keys and collect
    # the flat (turn, key) pairs. Small dup sets (the sane-input case)
    # probe with an InSet FILTER pushed into the cache scan — measured
    # 0.3-0.5 s vs 1.6-2.3 s for the broadcast-semi-join probe at 3M
    # turns (no join, no broadcast build, batch-stat pruning intact).
    # The concat key makes the filter a SUPERSET under pathological
    # NUL-bearing ids, so the driver applies the exact set afterwards;
    # big dup sets (only reachable just under the cap) fall back to the
    # broadcast semi-join to keep literal lists out of the plan.
    dup_set = {(r.trace_id, r.span_id) for r in dup_rows}
    if len(dup_rows) <= 10_000:
        sep = "\x00"
        probe = span_keys.filter(
            F.concat_ws(sep, "trace_id", "span_id").isin(
                [f"{t}{sep}{s}" for t, s in dup_set]
            )
        )
    else:
        # coalesce(1): the local relation defaults to defaultParallelism
        # near-empty partitions, and every broadcast build over it would
        # schedule one task each.
        dup_df = spark.createDataFrame(
            sorted(dup_set), schema="trace_id string, span_id string"
        ).coalesce(1)
        probe = span_keys.join(
            F.broadcast(dup_df), ["trace_id", "span_id"], "leftsemi"
        )
    pair_rows = [
        r for r in probe.collect() if (r.trace_id, r.span_id) in dup_set
    ]

    # Sequential replay in canonical arrival order.
    by_turn: dict[tuple, list[tuple]] = {}
    for r in pair_rows:
        by_turn.setdefault((r.conv_id, r.turn_idx), []).append(
            (r.trace_id, r.span_id)
        )
    committed: set[tuple] = set()
    invalid: list[tuple] = []
    for turn in sorted(by_turn):
        keys = by_turn[turn]
        if any(k in committed for k in keys):
            invalid.append(turn)
        else:
            committed.update(keys)
    if not invalid:
        return None, 0
    # coalesce(1): this tiny local relation is broadcast-built several
    # times downstream (drop_conflicted anti-joins in independent jobs);
    # at the default parallelism each build was a 32-task mini-job over
    # near-empty partitions (~0.3 s of pure scheduling each, round-6
    # stage profile).
    invalid_df = spark.createDataFrame(
        invalid, schema="conv_id string, turn_idx int"
    ).coalesce(1)
    return invalid_df, len(invalid)


def drop_conflicted(parsed: DataFrame, invalid_turns: DataFrame | None) -> DataFrame:
    """Anti-join the (tiny, broadcast) invalid-turn set out of the parsed
    stream — the distributed analogue of the rolled-back transactions."""
    if invalid_turns is None:
        return parsed
    return parsed.join(
        F.broadcast(invalid_turns), ["conv_id", "turn_idx"], "left_anti"
    )
