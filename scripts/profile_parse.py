"""Offline profile of the parse hot loop (no Spark/JVM needed).

The per-turn Python kernel (operators/records.py gen -> functions/
parse.py parse_turn) is the dominant e2e pipeline cost (VERDICT r4
item 6). This script replays the kernel's exact accumulation loop over
fixture batches read straight from the cached bench parquet via
pyarrow, under cProfile, so optimization work aims at measured hot
frames instead of guesses. The loop body below mirrors
operators/records.py gen() line-for-line (imports the same
parse_turn/_batch/_KIND_FIELDS) — keep them in sync.

Usage:
    python scripts/profile_parse.py [n_turns] [path-to-transcripts.parquet]
"""

from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_kernel(batches, out_schema, max_text_bytes=10 * 1024 * 1024,
               emit_text=True) -> int:
    """operators/records.py gen(), replayed verbatim."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from sqlite_otel_spark.functions.parse import parse_turn
    from sqlite_otel_spark.operators.records import (
        _INPUT_COLS,
        _KIND_FIELDS,
        _LINEAGE,
        _batch,
    )

    n_out = 0
    for rb in batches:
        names = rb.schema.names
        col = {c: rb.column(names.index(c)) for c in _INPUT_COLS}
        texts = col["text"].to_pylist()
        nbs = col["nb"].to_pylist()
        sig: list = []
        err: list = []
        idx: dict[str, list[int]] = {k: [] for k in _KIND_FIELDS}
        kacc = {
            k: {c: [] for c in fields}
            for k, (_, fields) in _KIND_FIELDS.items()
        }
        for i, (text, nb) in enumerate(zip(texts, nbs)):
            p = parse_turn(text, max_text_bytes, n_bytes=nb)
            sig.append(p["signal_type"])
            err.append(p["error"])
            for kind, (plural, fields) in _KIND_FIELDS.items():
                recs = p[plural]
                if not recs:
                    continue
                a = kacc[kind]
                ix = idx[kind]
                for r in recs:
                    ix.append(i)
                    for c in fields:
                        a[c].append(r[c])
        turn_cols = {
            **{c: col[c] for c in _LINEAGE},
            "signal_type": sig,
            "error": err,
        }
        if emit_text:
            turn_cols["text"] = col["text"]
        else:
            turn_cols["n_bytes"] = col["nb"]
        n_out += _batch("turn", rb.num_rows, turn_cols, out_schema).num_rows
        for kind, ix in idx.items():
            if not ix:
                continue
            ixa = pa.array(ix, type=pa.int64())
            cols = {c: pc.take(col[c], ixa) for c in _LINEAGE}
            cols.update(kacc[kind])
            n_out += _batch(kind, len(ix), cols, out_schema).num_rows
    return n_out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    if len(sys.argv) > 2:
        path = sys.argv[2]
    else:
        import bench

        path = bench.ensure_transcripts(max(20_000, n))

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from sqlite_otel_spark.operators.records import _INPUT_COLS, _pa_schema

    tbl = pq.read_table(path).slice(0, n)
    # replicate the JVM-side projection records.py feeds the kernel
    tbl = tbl.add_column(
        len(tbl.schema), "ts_us", pc.cast(tbl.column("ts"), "int64"))
    tbl = tbl.add_column(
        len(tbl.schema), "nb", pc.binary_length(tbl.column("text")))
    tbl = tbl.select(list(_INPUT_COLS))
    batches = tbl.combine_chunks().to_batches(max_chunksize=50_000)
    print(f"{tbl.num_rows} turns in {len(batches)} arrow batches from {path}")
    out_schema = _pa_schema(extra_n_bytes=False)

    t0 = time.monotonic()
    n_out = run_kernel(iter(batches), out_schema)
    wall = time.monotonic() - t0
    print(f"plain pass: {wall:.2f}s "
          f"({tbl.num_rows / wall:,.0f} turns/s single-core), "
          f"{n_out} records")

    prof = cProfile.Profile()
    prof.enable()
    run_kernel(iter(batches), out_schema)
    prof.disable()
    stats = pstats.Stats(prof)
    stats.sort_stats("cumulative").print_stats(30)


if __name__ == "__main__":
    main()
