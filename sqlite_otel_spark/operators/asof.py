"""As-of (point-in-time) join — the canonical operator Spark's built-in
join set lacks (reference-class engines expose it for telemetry/event
attribution; cf. the brief's custom-operator list).

Implemented as a composition of existing DataFrame ops, NOT a UDF or a
range-join: both sides are tagged and unioned, shuffled ONCE on the
join key, sorted by (ts, side, tiebreak) within each key partition, and
the right side's columns are carried forward with
``last(..., ignorenulls=True)`` over a running window. Each left row
then holds the most recent right row with ``right.ts <= left.ts``
(inclusive: right rows sort BEFORE left rows at equal ts).

Scale shape: exactly one hash shuffle on the key + one sort — the
merge-scan as-of plan; no O(|L|x|R|) range-join blowup, no per-row
Python. All same-window ``last`` calls collapse into ONE Window node
(single exchange+sort) in the optimized plan. Hot keys skew the sort
like any keyed shuffle — salt upstream if a single key's rows exceed a
partition (same remedy as the pipeline's conv_id salting).

Determinism: ties among right rows at identical (key, ts) are broken by
``right_order`` in its native type — any orderable column, string ids
included (largest wins — it sorts last and last() carries it),
so results are stable across cluster sizes and match the DuckDB oracle
twin, which uses the same union-window formulation (plain ANSI window
functions; DuckDB's native ASOF JOIN leaves same-ts right-row ties
unspecified, so the oracle does not use it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str],
    right_order: str,
    prefix: str = "r_",
) -> DataFrame:
    """Attach, to every left row, the most recent right row (by ``ts``,
    inclusive) with the same ``key``. Right columns come back as
    ``{prefix}{col}`` (NULL when no right row precedes the left row).

    ``right_cols`` are the right-side payload columns to carry;
    ``right_order`` breaks same-(key, ts) ties among right rows
    (largest value wins).
    """
    carried = [f"{prefix}{c}" for c in right_cols]
    # The tiebreak keeps its NATIVE type: any orderable column (string
    # ids included) works. The old cast-to-long turned non-numeric
    # tiebreaks into NULL for every row, silently voiding the
    # determinism guarantee (ADVICE r4).
    tie_type = right.schema[right_order].dataType
    l2 = left.withColumn("__side", F.lit(1)).withColumn(
        "__tie", F.lit(None).cast(tie_type)
    )
    r2 = right.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("__side"),
        F.col(right_order).alias("__tie"),
        *[F.col(c).alias(p) for c, p in zip(right_cols, carried)],
    )
    u = l2.unionByName(r2, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__side").asc(),
                 F.col("__tie").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in carried:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return u.where(F.col("__side") == 1).drop("__side", "__tie")
