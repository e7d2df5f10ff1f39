"""Per-stage empirical profile of the HEADLINE pipeline config (guide
§1.1/§7.1: find where the time actually goes before changing anything).

Runs one warmed timed_pipeline at local[CPUS] and dumps every stage's
metrics from the UI REST API — duration, executor run/cpu time, shuffle
read/write bytes, input bytes, memory spill — sorted by task time, so
the optimization targets are ranked by evidence instead of guesses.

Usage: python scripts/stage_profile.py [n_turns]
       python scripts/stage_profile.py --query <name> [--sink noop|count]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _snapshot(ui: str, app_id: str) -> set:
    return {
        s["stageId"]
        for s in json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages"))
    }


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from bench import ensure_transcripts, new_session, timed_pipeline

    query = None
    sink = "count"
    args = sys.argv[1:]
    if args and args[0] == "--query":
        query = args[1]
        if len(args) > 3 and args[2] == "--sink":
            sink = args[3]
        n_turns = 0
    else:
        n_turns = int(args[0]) if args else 3_000_000

    if query is None:
        path = ensure_transcripts(n_turns)
        wpath = ensure_transcripts(max(20_000, n_turns // 10))
        spark = new_session(f"local[{CPUS}]", 2 * CPUS,
                            input_bytes=os.path.getsize(path))
        timed_pipeline(spark, wpath, 2 * CPUS)  # warm (JIT/codegen/workers)
    else:
        spark = new_session(f"local[{CPUS}]", 2 * CPUS)

    ui = spark.sparkContext.uiWebUrl
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]

    if query is not None:
        import sqlite_otel_spark.queries as Q

        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        fn = Q.QUERIES[query]

        def run():
            if sink == "noop":
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
            else:
                fn(spark, sf_dir).count()

        if not os.environ.get("STAGEPROF_NOWARM"):
            run()  # warm
        before = _snapshot(ui, app_id)
        t0 = time.monotonic()
        run()
        wall = time.monotonic() - t0
    else:
        before = _snapshot(ui, app_id)
        t0 = time.monotonic()
        wall = timed_pipeline(spark, path, 2 * CPUS)
    print(json.dumps({"wall": round(wall, 2), "n_turns": n_turns,
                      "query": query,
                      "total": round(time.monotonic() - t0, 2)}), flush=True)

    stages = json.load(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete"))
    rows = []
    for s in stages:
        if s["stageId"] in before:
            continue
        rows.append({
            "stage": s["stageId"],
            "name": s["name"].split("\n")[0][:70],
            "tasks": s["numCompleteTasks"],
            "run_s": round(s["executorRunTime"] / 1000, 2),
            "cpu_s": round(s["executorCpuTime"] / 1e9, 2),
            "input_mb": round(s["inputBytes"] / 2**20, 1),
            "sh_read_mb": round(s["shuffleReadBytes"] / 2**20, 1),
            "sh_write_mb": round(s["shuffleWriteBytes"] / 2**20, 1),
            "spill_mb": round(s["memoryBytesSpilled"] / 2**20, 1),
            "first_launch": s.get("firstTaskLaunchedTime"),
            "completed": s.get("completionTime"),
        })
    rows.sort(key=lambda r: -r["run_s"])
    for r in rows:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
