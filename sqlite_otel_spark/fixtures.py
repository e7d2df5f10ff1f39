"""Deterministic synthetic transcript fixtures (FIXTURES.md §1-§3).

The input table matches BASELINE.json input_hint exactly:
``(conv_id string, turn_idx int32, role string, text string, tool string,
ts timestamp)``. ``text`` carries OTLP/JSON envelopes in the shapes the
reference parses (database/{traces,logs,metrics}.go), with ~5% malformed
rows covering every reject/edge path, a Zipf-ish conversation-length mix
(hot conversations exercise salting/skew), and dimension attributes that
repeat across conversations with non-sorted key insertion order
(exercises canonical-JSON dedup, database/shared.go:37-43).

Everything is a pure function of (n_turns, seed) — no wall clock, no
global state — so tests, the DuckDB/golden oracles, and the benchmark
all see identical data.
"""

from __future__ import annotations

import datetime as dt
import json
import random

BASE_TS = dt.datetime(2025, 1, 1, 0, 0, 0)  # naive UTC; session tz is UTC

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["bash", "read", "write", "search", "none", "ghost"]  # 'ghost' absent from tool_dim

# ~10 distinct resources; insertion order of keys deliberately unsorted.
RESOURCE_POOL = [
    {"attributes": {"service.name": f"svc-{i}", "deployment.env": env, "az": f"az-{i % 3}"},
     "schemaUrl": "" if i % 2 == 0 else "https://opentelemetry.io/schemas/1.21.0"}
    for i, env in enumerate(["prod", "stage", "dev", "prod", "prod", "stage", "dev", "prod", "stage", "dev"])
]
# One resource with attributes given as an OTLP-style kv array (marshal
# preserves array order) and one with HTML-escapable characters.
RESOURCE_POOL[7] = {
    "attributes": [{"key": "service.name", "value": {"stringValue": "svc-7"}},
                   {"key": "zz.first", "value": {"stringValue": "a<b&c>d"}}],
    "schemaUrl": "",
}

SCOPE_POOL = [
    {"name": f"scope-{i}", "version": f"1.{i}.0",
     "attributes": {"lib.lang": "go" if i % 2 else "py", "b_key": i, "a_key": "x"},
     "schemaUrl": ""}
    for i in range(5)
]

METRIC_POOL = [
    {"name": f"metric_{i:02d}", "unit": ["ms", "1", "By", "s"][i % 4],
     "type": ["gauge", "sum", "histogram", "exponentialHistogram", "summary"][i % 5],
     "description": f"metric number {i}"}
    for i in range(20)
]


def _span(rng: random.Random, trace_id: str, span_id: str, t0: int) -> dict:
    return {
        "traceId": trace_id,
        "spanId": span_id,
        "parentSpanId": "" if rng.random() < 0.5 else f"{rng.getrandbits(64):016x}",
        "name": rng.choice(["GET /api", "db.query", "render", "llm.call"]),
        "kind": rng.randint(0, 5),
        "startTimeUnixNano": str(t0),
        "endTimeUnixNano": str(t0 + rng.randint(1_000, 5_000_000)),
        "attributes": [{"key": "http.status", "value": {"intValue": str(rng.choice([200, 404, 500]))}}],
        "status": {"code": rng.randint(0, 2), "message": ""},
    }


def _trace_text(rng: random.Random, seq: int, t0: int) -> str:
    res = RESOURCE_POOL[rng.randrange(len(RESOURCE_POOL))]
    sc = SCOPE_POOL[rng.randrange(len(SCOPE_POOL))]
    trace_id = f"{seq:032x}"
    spans = [_span(rng, trace_id, f"{seq * 8 + j:016x}", t0) for j in range(rng.randint(1, 3))]
    scope_span = {"scope": sc, "spans": spans}
    if rng.random() < 0.1:
        scope_span = {"spans": spans}  # missing scope -> default empty scope
    return json.dumps({"resourceSpans": [{"resource": res, "scopeSpans": [scope_span]}]})


def _log_text(rng: random.Random, t0: int) -> str:
    res = RESOURCE_POOL[rng.randrange(len(RESOURCE_POOL))]
    sc = SCOPE_POOL[rng.randrange(len(SCOPE_POOL))]
    records = []
    for _ in range(rng.randint(1, 4)):
        rec = {
            "timeUnixNano": str(t0),
            "observedTimeUnixNano": str(t0 + 1000),
            "severityNumber": rng.choice([1, 5, 9, 13, 17]),
            "severityText": rng.choice(["TRACE", "DEBUG", "INFO", "WARN", "ERROR"]),
            "body": {"stringValue": f"event {rng.randrange(1000)} ok"},
            "attributes": [{"key": "code.line", "value": {"intValue": str(rng.randrange(500))}}],
            "flags": 0,
        }
        if rng.random() < 0.15:
            del rec["body"]        # -> '{}' default (logs.go:132-135)
        if rng.random() < 0.15:
            del rec["attributes"]  # -> '[]' default (logs.go:145-148)
        records.append(rec)
    rl = {"resource": res, "scopeLogs": [{"scope": sc, "logRecords": records}]}
    if rng.random() < 0.05:
        del rl["resource"]  # -> resource_id = 0, no dim row (logs.go:29-35)
    return json.dumps({"resourceLogs": [rl]})


def _metric_text(rng: random.Random, t0: int) -> str:
    res = RESOURCE_POOL[rng.randrange(len(RESOURCE_POOL))]
    sc = SCOPE_POOL[rng.randrange(len(SCOPE_POOL))]
    md = METRIC_POOL[rng.randrange(len(METRIC_POOL))]
    mt = md["type"]
    points = []
    for _ in range(rng.randint(1, 3)):
        dp: dict = {"timeUnixNano": str(t0), "startTimeUnixNano": str(t0 - 10_000),
                    "attributes": [{"key": "host", "value": {"stringValue": f"h{rng.randrange(4)}"}}]}
        if mt in ("gauge", "sum"):
            if rng.random() < 0.5:
                dp["asDouble"] = round(rng.uniform(0, 100), 3)
            else:
                dp["asInt"] = str(rng.randrange(10_000))
        elif mt == "histogram":
            dp.update({"count": str(rng.randrange(100)), "sum": round(rng.uniform(0, 1e4), 2),
                       "bucketCounts": ["1", "2", "3"], "explicitBounds": [0.1, 1.0, 10.0]})
            if rng.random() < 0.3:
                # attributes as object -> exercises the _metricData fold
                dp["attributes"] = {"host": f"h{rng.randrange(4)}"}
        elif mt == "exponentialHistogram":
            dp.update({"count": str(rng.randrange(100)), "sum": 12.5, "scale": 2,
                       "zeroCount": "0", "positive": {"offset": 1, "bucketCounts": ["1"]}})
        else:  # summary
            dp.update({"count": str(rng.randrange(100)), "sum": 1.5,
                       "quantileValues": [{"quantile": 0.5, "value": 1.0}]})
        points.append(dp)
    metric = {"name": md["name"], "unit": md["unit"], "description": md["description"],
              mt: {"dataPoints": points}}
    if rng.random() < 0.1:
        # Conflicting re-definition: first definition wins (shared.go:140-141)
        metric["description"] = md["description"] + " (redefined)"
    return json.dumps({"resourceMetrics": [{"resource": res,
                                            "scopeMetrics": [{"scope": sc, "metrics": [metric]}]}]})


def _edge_texts() -> list[str]:
    """One row per edge case in SURVEY.md §7 / FIXTURES.md §2."""
    j = json.dumps
    res = RESOURCE_POOL[0]
    sc = SCOPE_POOL[0]
    t = "ff" * 16
    return [
        "",                                    # empty -> reject empty_body
        "   \t ",                              # whitespace -> empty_body
        "plain text, not telemetry",           # -> not_json_object
        "[1,2,3]",                             # JSON array -> not_json_object
        '{"resourceSpans": broken',            # -> invalid_json
        j({"somethingElse": 1}),               # -> unknown_signal
        j({"resourceSpans": "nope"}),          # envelope not array -> trace error
        # missing traceId -> whole turn rejected (traces.go:92-95)
        j({"resourceSpans": [{"resource": res, "scopeSpans": [{"scope": sc,
            "spans": [{"spanId": "00" * 8, "name": "x"}]}]}]}),
        # duplicate (traceId,spanId) within one turn -> rejected (db.go:95)
        j({"resourceSpans": [{"resource": res, "scopeSpans": [{"scope": sc,
            "spans": [{"traceId": t, "spanId": "aa" * 8, "startTimeUnixNano": "1"},
                      {"traceId": t, "spanId": "aa" * 8, "startTimeUnixNano": "2"}]}]}]}),
        # bad timestamp -> rejected (shared.go:131-134)
        j({"resourceSpans": [{"resource": res, "scopeSpans": [{"scope": sc,
            "spans": [{"traceId": t, "spanId": "bb" * 8, "startTimeUnixNano": "12x"}]}]}]}),
        # resource missing -> resourceSpan skipped entirely (traces.go:30-33)
        j({"resourceSpans": [{"scopeSpans": [{"scope": sc,
            "spans": [{"traceId": t, "spanId": "cc" * 8}]}]}]}),
        # resource present, scopeSpans missing -> resource dim still touched
        j({"resourceSpans": [{"resource": {"attributes": {"only.dim": "touch"},
                                           "schemaUrl": ""}}]}),
        # non-string severityText -> logs hard-fail (logs.go:114-122)
        j({"resourceLogs": [{"resource": res, "scopeLogs": [{"scope": sc,
            "logRecords": [{"severityText": 5, "body": "x"}]}]}]}),
        # logs: scopeLogs missing -> strict error (logs.go:39-41)
        j({"resourceLogs": [{"resource": res}]}),
        # metrics: resource missing -> error (metrics.go:34-37)
        j({"resourceMetrics": [{"scopeMetrics": []}]}),
        # unknown metric type -> error (metrics.go:113-116)
        j({"resourceMetrics": [{"resource": res, "scopeMetrics": [{"scope": sc,
            "metrics": [{"name": "m_unknown", "weird": {}}]}]}]}),
        # bad asInt -> error (metrics.go:186-190)
        j({"resourceMetrics": [{"resource": res, "scopeMetrics": [{"scope": sc,
            "metrics": [{"name": "m_badint", "gauge":
                {"dataPoints": [{"asInt": "not-a-number"}]}}]}]}]}),
        # metric def with zero data points -> metrics row, no points row
        j({"resourceMetrics": [{"resource": res, "scopeMetrics": [{"scope": sc,
            "metrics": [{"name": "m_empty", "unit": "1", "gauge": {}}]}]}]}),
    ]


def _cascade_texts() -> list[tuple[str, str]]:
    """Cross-turn span-PK cascade (SURVEY §7 risk (c)): turn A inserts span
    X; turn B carries X and Y -> rejected because X is taken; turn C
    carries Y -> ACCEPTED because B never committed. Sequential-commit
    semantics of the global spans PRIMARY KEY. Returned as (conv_id, text)
    with conv ids ordered A < B < C in the canonical arrival order."""
    j = json.dumps
    res = RESOURCE_POOL[1]
    sc = SCOPE_POOL[1]
    tx = "ab" * 16

    def env(spans):
        return j({"resourceSpans": [{"resource": res,
                                     "scopeSpans": [{"scope": sc, "spans": spans}]}]})

    x = {"traceId": tx, "spanId": "11" * 8, "name": "X", "startTimeUnixNano": "100"}
    y = {"traceId": tx, "spanId": "22" * 8, "name": "Y", "startTimeUnixNano": "200"}
    return [
        ("conv-cascade-a", env([x])),
        ("conv-cascade-b", env([dict(x, name="X-dup"), y])),
        ("conv-cascade-c", env([dict(y, name="Y-late")])),
    ]


def make_transcripts(n_turns: int = 2000, seed: int = 42, include_edges: bool = True,
                     hot_frac: float = 0.1):
    """Generate ``n_turns`` transcript rows (plus a fixed edge/cascade tail
    when ``include_edges``). Returns a list of dicts matching input_hint.
    Conversation lengths are Zipf-ish: conversation 0 is 'hot' with
    ``hot_frac`` (default ~10%) of all turns — the skew target for
    salting. bench.py's skew variant raises it to 0.30 to measure the
    salted-repartition win on an adversarially hot conversation; the
    default stays 0.1 so every oracle/golden hash is unchanged."""
    rng = random.Random(seed)
    rows: list[dict] = []
    turn_seq = 0

    def add(conv_id: str, turn_idx: int, text: str) -> None:
        nonlocal turn_seq
        rows.append({
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": ROLES[rng.randrange(len(ROLES))],
            "text": text,
            "tool": TOOLS[rng.randrange(len(TOOLS))],
            # deterministic spread over > 3 hourly buckets
            "ts": BASE_TS + dt.timedelta(seconds=(turn_seq * 37) % (6 * 3600),
                                         microseconds=turn_seq % 1000),
        })
        turn_seq += 1

    def gen_text() -> str:
        nonlocal turn_seq
        t0 = 1_735_689_600_000_000_000 + turn_seq * 1_000_000  # 2025-01-01 base nanos
        r = rng.random()
        if r < 0.50:
            return _log_text(rng, t0)
        if r < 0.80:
            return _trace_text(rng, turn_seq, t0)
        return _metric_text(rng, t0)

    hot = max(1, int(n_turns * hot_frac))
    for i in range(hot):  # hot conversation (skew)
        add("conv-00000000", i, gen_text())
    conv, idx = 1, 0
    remaining = n_turns - hot
    conv_len = rng.randint(2, 12)
    while remaining > 0:
        add(f"conv-{conv:08d}", idx, gen_text())
        idx += 1
        remaining -= 1
        if idx >= conv_len:
            conv, idx, conv_len = conv + 1, 0, rng.randint(2, 12)

    if include_edges:
        for i, text in enumerate(_edge_texts()):
            add("conv-edge-0000", i, text)
        for conv_id, text in _cascade_texts():
            add(conv_id, 0, text)
    return rows


def role_dim_rows() -> list[dict]:
    return [
        {"role": "user", "role_kind": "human", "is_automated": False},
        {"role": "assistant", "role_kind": "model", "is_automated": True},
        {"role": "system", "role_kind": "config", "is_automated": True},
        {"role": "tool", "role_kind": "machine", "is_automated": True},
    ]


def tool_dim_rows() -> list[dict]:
    # 'ghost' deliberately absent -> left-join null path (FIXTURES.md §3)
    return [
        {"tool": "bash", "tool_category": "exec", "cost_weight": 3.0},
        {"tool": "read", "tool_category": "fs", "cost_weight": 1.0},
        {"tool": "write", "tool_category": "fs", "cost_weight": 2.0},
        {"tool": "search", "tool_category": "net", "cost_weight": 2.5},
        {"tool": "none", "tool_category": "none", "cost_weight": 0.0},
    ]


def write_transcripts_parquet(path: str, n_turns: int, seed: int = 42,
                              include_edges: bool = True,
                              hot_frac: float = 0.1,
                              row_group_size: int = 65_536) -> int:
    """Write fixture transcripts as a parquet file via pyarrow (no Spark
    needed — used by bench.py to build cached inputs).

    ``row_group_size`` defaults to 64k rows: pyarrow's 1M-row default
    gave a 3M-turn fixture only THREE row groups, capping parquet scan
    parallelism at 3 tasks no matter the level (measured: the scan+
    shuffle stage idled 5 of 8 cores at local[8]). A real 10^12-turn
    table has thousands of files/row groups; fine-grained groups make
    the small-scale fixture splittable the same way."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = make_transcripts(n_turns, seed=seed, include_edges=include_edges,
                            hot_frac=hot_frac)
    schema = pa.schema([
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ])
    table = pa.Table.from_pylist(rows, schema=schema)
    pq.write_table(table, path, compression="zstd",
                   row_group_size=row_group_size)
    return len(rows)
