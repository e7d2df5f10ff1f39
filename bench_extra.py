"""Round-6 optimization measurement harness (bench.py is FROZEN — this
file carries the extra instrumentation the optimization round needs).

Three subcommands:

  queries [names...]   time declared queries with the frozen bench's own
                       methodology (.count(), min over k samples, steal%
                       gate) and additionally a noop-sink wall (guide
                       §1.4: eagerly computes every column, no sink
                       cost); writes one JSON line per query.
  explain [names...]   dump .explain('formatted') for each query to
                       plans/r06/<name>_<tag>.txt  (tag from --tag).
  phases               decompose the HEADLINE pipeline configuration
                       (emit_text=True, the frozen bench's timed
                       section) into parse/cache, conflict, fanout
                       walls with GC + cpu_util per phase.

Usage:
  python bench_extra.py queries dp_minhash_lsh dp_ngram_jaccard
  python bench_extra.py explain --tag before dp_minhash_lsh
  python bench_extra.py phases [n_turns]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

DEFAULT_QUERIES = [
    "q1_lineitem_rollup", "q3_top_revenue_orders", "q5_region_nation_rollup",
    "a3_time_bucket_counts", "a5_retention_topk", "d5_broadcast_enrichment",
    "w1_window_rank_orders", "dp_ngram_jaccard", "dp_minhash_lsh",
    "dp_simhash_neardup", "dp_ann_brute_topk", "dp_ann_lsh_topk",
    "dp_ann_ivf_topk", "dp_fingerprint", "dp_token_count",
    "dp_multimodal_features", "dp_text_normalize", "dp_pii_redact",
    "dp_doc_chunks", "dp_repetition_signals", "dp_decontaminate",
    "dp_sequence_pack", "extra_asof_join", "dp_train_split",
    "dp_mixture_weights", "dp_embedding_quantize",
]


def _session(rep: int | None = None):
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from bench import new_session

    return new_session(f"local[{CPUS}]", rep or 2 * CPUS)


def cmd_queries(names: list[str], k: int, cold: bool = False) -> None:
    """``cold=True`` replicates the FROZEN bench's time_queries
    methodology: no per-query warm run, one session, queries in order —
    the first (and only) sample pays plan optimization + codegen
    compile, exactly like the driver's recorded walls."""
    from bench import _cpu_sample

    import sqlite_otel_spark.queries as Q

    spark = _session()
    for name in names:
        fn = Q.QUERIES[name]
        if not cold:
            fn(spark, SF_DIR).count()  # warm (JIT/codegen/broadcast)
        walls, noops, steals = [], [], []
        for _ in range(k):
            b0, s0 = _cpu_sample()
            t0 = time.monotonic()
            n = fn(spark, SF_DIR).count()
            walls.append(round(time.monotonic() - t0, 3))
            b1, s1 = _cpu_sample()
            steals.append(round(100.0 * (s1 - s0) / max(b1 - b0 + s1 - s0, 1), 2))
            if cold:
                noops.append(-1.0)
                continue
            t0 = time.monotonic()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            noops.append(round(time.monotonic() - t0, 3))
        print(json.dumps({
            "query": name, "rows": n, "count_walls": walls,
            "noop_walls": noops, "steal_pct": steals,
            "count_min": min(walls), "noop_min": min(noops),
        }), flush=True)


def cmd_explain(names: list[str], tag: str) -> None:
    spark = _session()
    import sqlite_otel_spark.queries as Q

    out_dir = os.path.join(REPO, "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = Q.QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}", flush=True)


def cmd_phases(n_turns: int) -> None:
    """Headline-configuration (emit_text=True) phase decomposition at
    local[CPUS] — scripts/phase_profile.py covers the notext criterion
    config; the frozen bench's headline times THIS config."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.storagelevel import StorageLevel

    from bench import ensure_transcripts, _cpu_sample

    from sqlite_otel_spark.config import PipelineConfig
    from sqlite_otel_spark.operators import aggregates as agg_ops
    from sqlite_otel_spark.operators import facts as facts_ops
    from sqlite_otel_spark.operators.conflicts import (
        drop_conflicted,
        resolve_span_conflicts,
    )
    from sqlite_otel_spark.operators.dims import (
        build_metric_defs,
        build_resources,
        build_scopes,
        enrich_record_ids,
    )
    from sqlite_otel_spark.operators.enrich import enrich, role_dim, tool_dim
    from sqlite_otel_spark.operators.records import to_records
    from sqlite_otel_spark.plans import pipeline as plan

    rep = 2 * CPUS
    path = ensure_transcripts(n_turns)
    spark = _session(rep)
    cfg = PipelineConfig()

    # warmup: full benched section on 1/10 input
    from bench import timed_pipeline

    wpath = ensure_transcripts(max(20_000, n_turns // 10))
    timed_pipeline(spark, wpath, rep)

    def gc_s() -> float:
        beans = (spark._jvm.java.lang.management.ManagementFactory
                 .getGarbageCollectorMXBeans())
        t, it = 0, beans.iterator()
        while it.hasNext():
            t += it.next().getCollectionTime()
        return t / 1000.0

    rows = []

    def phase(name, fn):
        b0, s0 = _cpu_sample()
        g0 = gc_s()
        t0 = time.monotonic()
        out = fn()
        wall = time.monotonic() - t0
        b1, s1 = _cpu_sample()
        row = {"phase": name, "wall": round(wall, 2),
               "gc_s": round(gc_s() - g0, 2),
               "cpu_util": round((b1 - b0) / os.sysconf("SC_CLK_TCK")
                                 / (wall * CPUS), 3)}
        rows.append(row)
        print(json.dumps(row), flush=True)
        return out

    df = spark.read.parquet(path)
    records = enrich_record_ids(
        to_records(df, cfg.max_text_bytes, emit_text=True),
        cfg.surrogate_id_mode,
    ).persist(StorageLevel.MEMORY_AND_DISK)
    phase("parse_cache_build", lambda: records.count())
    st = phase("conflict_resolve",
               lambda: resolve_span_conflicts(spark, records,
                                              cfg.max_conflict_turns))
    invalid = st[0]

    def fanout():
        valid = drop_conflicted(records, invalid)
        resources = build_resources(valid, cfg.surrogate_id_mode)
        scopes = build_scopes(valid, cfg.surrogate_id_mode)
        metric_defs = build_metric_defs(valid, resources, scopes,
                                        cfg.surrogate_id_mode)
        sinks = {
            "resources": resources,
            "instrumentation_scopes": scopes,
            "metrics": metric_defs,
            "spans": facts_ops.build_spans(valid, resources, scopes,
                                           cfg.surrogate_id_mode),
            "log_records": facts_ops.build_log_records(
                valid, resources, scopes, cfg.surrogate_id_mode),
            "metric_data_points": facts_ops.build_points(
                valid, resources, scopes, metric_defs,
                cfg.surrogate_id_mode),
            "rejects": facts_ops.build_rejects(records),
        }
        routed = enrich(facts_ops.build_routed(valid), role_dim(spark),
                        tool_dim(spark))
        res = plan.PipelineResult(
            sinks=sinks, routed=routed, accounting=None,
            by_signal_tool=None, by_time_bucket=None,
        )
        with ThreadPoolExecutor(max_workers=2) as pool:
            a = pool.submit(agg_ops.sink_counts, sinks)
            b = pool.submit(plan.collect_aggregates, res)
            a.result()
            b.result()

    phase("fanout_sinks_aggs", fanout)
    phase("cache_rescan_control",
          lambda: records.groupBy("rec_kind").count().collect())
    total = sum(r["wall"] for r in rows[:3])
    print(json.dumps({"phase": "TOTAL_benched_equiv", "wall": round(total, 2),
                      "n_turns": n_turns, "cpus": CPUS}), flush=True)
    records.unpersist()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["queries", "explain", "phases"])
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--cold", action="store_true")
    ap.add_argument("-k", type=int, default=2)
    a = ap.parse_args()
    if a.cmd == "queries":
        cmd_queries(a.names or DEFAULT_QUERIES, a.k, cold=a.cold)
    elif a.cmd == "explain":
        cmd_explain(a.names or DEFAULT_QUERIES, a.tag)
    else:
        n = int(a.names[0]) if a.names else 3_000_000
        cmd_phases(n)


if __name__ == "__main__":
    main()
