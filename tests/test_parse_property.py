"""Property-based differential testing: for ANY JSON-ish input, the
vectorizable parser (functions/parse.parse_turn) and the independent
sequential oracle (oracle.OracleDB) must agree on accept/reject, the
reject reason class, every record count, and every projected field —
the two implementations share only the canonical-JSON helper, so
agreement on random inputs is strong evidence both encode the
reference's semantics (SURVEY §5.2; the reference itself has no
property tests — known gap we close)."""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from sqlite_otel_spark.functions.parse import parse_turn
from sqlite_otel_spark.oracle import OracleDB

# -- input strategies: plausible-to-mangled OTLP shapes ---------------------

scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**63),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=12),
    # strings that look like numbers (timestamp/asInt paths)
    st.sampled_from(["123", "-5", "  42 ", "1e3", "abc", "", "9" * 25]),
    # the orjson-fast-path exactness frontier (canonical_json._orjson_exact):
    # ints straddling 2^53, floats straddling the 1e16 / 1e-4 repr-format
    # cutoffs and integer-valued floats — pipeline (orjson-capable) and
    # oracle (stdlib-only) must stay byte-identical on all of them
    st.sampled_from([
        2**53 - 1, 2**53, 2**53 + 1, -(2**53) - 1, 2**60 + 7,
        3.0, -2.0, 1e16, 9999999999999998.0, 1.5e16, 1e-4, 9.9e-5,
        1e21, 1.0000000000000002,
    ]),
)

json_values = st.recursive(
    scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=3),
        st.dictionaries(st.sampled_from(
            ["attributes", "schemaUrl", "name", "version", "k"]), children, max_size=3),
    ),
    max_leaves=8,
)

maybe = st.one_of(st.none(), json_values)

resources = st.one_of(
    json_values,
    st.fixed_dictionaries({}, optional={"attributes": maybe, "schemaUrl": maybe}),
)
scopes = st.one_of(
    json_values,
    st.fixed_dictionaries({}, optional={
        "name": maybe, "version": maybe, "attributes": maybe, "schemaUrl": maybe}),
)

span_ids = st.sampled_from(["", "aa", "bb", "cc", 7, None])
spans = st.one_of(
    json_values,
    st.fixed_dictionaries({}, optional={
        "traceId": span_ids, "spanId": span_ids, "name": maybe, "kind": maybe,
        "startTimeUnixNano": maybe, "endTimeUnixNano": maybe,
        "attributes": maybe, "events": maybe, "links": maybe,
        "status": st.one_of(maybe, st.fixed_dictionaries({}, optional={
            "code": maybe, "message": maybe})),
        "traceState": maybe, "parentSpanId": maybe,
    }),
)

log_records = st.one_of(
    json_values,
    st.fixed_dictionaries({}, optional={
        "timeUnixNano": maybe, "observedTimeUnixNano": maybe,
        "severityNumber": maybe, "severityText": maybe, "body": maybe,
        "attributes": maybe, "traceId": maybe, "spanId": maybe, "flags": maybe,
    }),
)

data_points = st.one_of(
    json_values,
    st.fixed_dictionaries({}, optional={
        "attributes": maybe, "startTimeUnixNano": maybe, "timeUnixNano": maybe,
        "asDouble": maybe, "asInt": maybe, "exemplars": maybe, "flags": maybe,
        "count": maybe, "sum": maybe, "bucketCounts": maybe,
        "explicitBounds": maybe, "scale": maybe, "zeroCount": maybe,
        "positive": maybe, "negative": maybe, "quantileValues": maybe,
    }),
)

metrics = st.one_of(
    json_values,
    st.fixed_dictionaries(
        {},
        optional={
            "name": st.one_of(maybe, st.sampled_from(["m1", "m2", ""])),
            "description": maybe, "unit": maybe,
            "gauge": st.one_of(maybe, st.fixed_dictionaries({}, optional={
                "dataPoints": st.lists(data_points, max_size=3)})),
            "sum": st.one_of(maybe, st.fixed_dictionaries({}, optional={
                "dataPoints": st.lists(data_points, max_size=2)})),
            "histogram": st.one_of(maybe, st.fixed_dictionaries({}, optional={
                "dataPoints": st.lists(data_points, max_size=2)})),
            "summary": st.one_of(maybe, st.fixed_dictionaries({}, optional={
                "dataPoints": st.lists(data_points, max_size=2)})),
        },
    ),
)


def envelope(outer_key, scope_key, leaf_key, leaf_strategy):
    inner = st.one_of(
        json_values,
        st.fixed_dictionaries({}, optional={
            "scope": scopes, leaf_key: st.lists(leaf_strategy, max_size=3)}),
    )
    item = st.one_of(
        json_values,
        st.fixed_dictionaries({}, optional={
            "resource": resources, scope_key: st.lists(inner, max_size=2)}),
    )
    return st.fixed_dictionaries({outer_key: st.one_of(maybe, st.lists(item, max_size=2))})


envelopes = st.one_of(
    envelope("resourceSpans", "scopeSpans", "spans", spans),
    envelope("resourceLogs", "scopeLogs", "logRecords", log_records),
    envelope("resourceMetrics", "scopeMetrics", "metrics", metrics),
    json_values.map(lambda v: {"mystery": v}),
)

texts = st.one_of(
    envelopes.map(lambda e: json.dumps(e)),
    st.text(max_size=40),          # mostly not JSON
    st.just(None),
)


# -- differential properties -------------------------------------------------

def oracle_one(text):
    db = OracleDB()
    db.process_turn("c", 0, text)
    return db


@settings(max_examples=400, deadline=None)
@given(texts)
def test_accept_reject_and_counts_agree(text):
    p = parse_turn(text)
    db = oracle_one(text)
    accepted_p = p["error"] is None
    accepted_o = len(db.accepted) == 1
    assert accepted_p == accepted_o, (text, p["error"], db.rejects)
    if not accepted_p:
        # same reject classification for the pre-parse reject reasons
        o_reason = db.rejects[0]["reason"]
        if p["error"] in ("empty_body", "oversize", "not_json_object",
                          "invalid_json", "unknown_signal"):
            assert p["error"] == o_reason
        return
    assert p["signal_type"] == db.accepted[0]["signal_type"]
    assert len(p["spans"]) == len(db.spans)
    assert len(p["logs"]) == len(db.log_records)
    assert len(p["points"]) == len(db.points)
    assert len(p["metric_defs"]) == len(db.metrics)
    # dimension touches: set equality on natural keys
    assert {(r["res_attributes"], r["res_schema_url"]) for r in p["resources"]} \
        == set(db.resources)
    assert {(r["scope_name"], r["scope_version"], r["scope_attributes"],
             r["scope_schema_url"]) for r in p["scopes"]} == set(db.scopes)


@settings(max_examples=200, deadline=None)
@given(texts)
def test_projected_fields_agree(text):
    p = parse_turn(text)
    db = oracle_one(text)
    if p["error"] is not None:
        return
    # spans: keyed by PK, field-level equality on the reference columns
    got = {(s["trace_id"], s["span_id"]): s for s in p["spans"]}
    want = dict(db.spans)
    assert got.keys() == want.keys()
    for k, s in got.items():
        w = want[k]
        for f in ("trace_state", "parent_span_id", "name", "kind",
                  "start_time_unix_nano", "end_time_unix_nano", "attributes",
                  "events", "links", "status_code", "status_message"):
            assert s[f] == w[f], (k, f, s[f], w[f])
    # log records: order-preserving list equality
    for mine, theirs in zip(p["logs"], db.log_records):
        for f in ("time_unix_nano", "observed_time_unix_nano", "severity_number",
                  "severity_text", "body", "attributes", "trace_id", "span_id",
                  "flags"):
            assert mine[f] == theirs[f], (f, mine[f], theirs[f])
    # data points: order-preserving equality on value + payload columns
    for mine, theirs in zip(p["points"], db.points):
        for f in ("metric_name", "metric_type", "attributes",
                  "start_time_unix_nano", "time_unix_nano", "value_double",
                  "value_int", "exemplars", "flags"):
            assert mine[f] == theirs[f], (f, mine[f], theirs[f])
