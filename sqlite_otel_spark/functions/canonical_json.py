"""Canonical JSON serialization matching Go's ``encoding/json.Marshal``.

The reference's dimension dedup depends on byte-identical canonical JSON
as the equality key (database/shared.go:37-43 — "Go's standard
json.Marshal sorts map keys, which is essential for the UNIQUE index").
Spark's ``to_json`` does NOT sort map keys (SURVEY §2.3 P9/C5), so both
the pipeline's parse UDF and the pure-Python oracle canonicalize through
this module.

Go parity notes (encoding/json behavior being mimicked):
 - object keys sorted lexicographically; arrays keep order;
 - compact separators (no spaces);
 - HTML-escaping of ``< > &`` and of U+2028/U+2029 inside strings
   (Go escapes these by default);
 - ``json.Unmarshal`` into ``interface{}`` decodes EVERY number as
   float64; integer-valued float64 re-marshals without a decimal point
   ("3", not "3.0") when |x| < 1e21 (Go's 'f'-format cutoff).

Known best-effort divergences (documented, don't affect our correctness
gate because pipeline and tests share this code): shortest-float repr
ties, integers above 2^53 lose precision in Go (we replicate via the
float64 round-trip), non-ASCII is emitted raw UTF-8 in both.
"""

from __future__ import annotations

import json
import math
from typing import Any

try:  # C-accelerated fast paths; stdlib remains the semantic reference
    import orjson as _orjson
except ImportError:  # pragma: no cover
    _orjson = None

# Go json.Marshal default HTML escaping; these bytes only occur inside
# string values, so a whole-document replace is equivalent.
_GO_ESCAPES = (
    ("<", "\\u003c"),
    (">", "\\u003e"),
    ("&", "\\u0026"),
    (" ", "\\u2028"),
    (" ", "\\u2029"),
)

_F_CUTOFF = 1e21  # Go encoder switches to exponent format at 1e21


_STRICT_DECODER = json.JSONDecoder(parse_int=float, parse_float=float)


def go_loads(text: str) -> Any:
    """Decode JSON with Go's ``map[string]interface{}`` number semantics:
    every number is float64. Like ``json.Decoder.Decode`` we accept
    (and ignore) trailing content after the first JSON value
    (handlers/handler_common.go:35 uses a streaming decoder).
    Raises ValueError on empty input (EOF) and json.JSONDecodeError on
    malformed input.

    Fast path: orjson (2.5x the stdlib scanner) — it returns ints AS
    ints, which is float64-EQUIVALENT for |v| <= 2^53 everywhere
    downstream (comparisons, int() coercions, canonical printing:
    Go prints integer-valued float64 without a decimal point); values
    outside that range are float64-round-tripped at their use sites
    (``_normalize`` here, ``_num_or_zero`` in parse.py). Inputs orjson
    rejects but the stdlib accepts (trailing content, Infinity/NaN
    literals, lone surrogates) fall back to the stdlib decoder, whose
    behavior is unchanged.
    """
    stripped = text.lstrip()
    if not stripped:
        raise ValueError("EOF")  # empty body — handler_common.go:38-41
    return _loads_stripped(stripped)


def _loads_stripped(stripped: str) -> Any:
    """``go_loads`` for input already known non-empty and left-stripped
    (the parse kernel strips once for its empty/'{' checks and decodes
    the same string — three lstrip copies per turn collapsed to one)."""
    if _orjson is not None:
        try:
            return _orjson.loads(stripped)
        except Exception:
            pass
    obj, _end = _STRICT_DECODER.raw_decode(stripped)
    return obj


_SAFE_INT = 1 << 53  # float64 represents every int in [-2^53, 2^53] exactly


def _normalize(obj: Any) -> Any:
    """Prepare a decoded tree for Go-compatible dumping: integer-valued
    floats below the 'f'-format cutoff become ints so they print as Go
    prints float64 ("3" not "3.0"); ints beyond 2^53 (possible on the
    orjson decode path — the stdlib path parses all numbers as float)
    take the float64 round trip Go's decoder would have applied."""
    if isinstance(obj, float):
        if math.isfinite(obj) and obj.is_integer() and abs(obj) < _F_CUTOFF:
            return int(obj)
        return obj
    if isinstance(obj, bool):
        return obj
    if isinstance(obj, int):
        if -_SAFE_INT <= obj <= _SAFE_INT:
            return obj
        try:
            f = float(obj)
        except OverflowError:  # beyond float64 range, as the stdlib path's inf
            f = math.inf if obj > 0 else -math.inf
        if math.isfinite(f) and abs(f) < _F_CUTOFF:
            return int(f)
        return f
    if isinstance(obj, dict):
        return {k: _normalize(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_normalize(v) for v in obj]
    return obj


def _orjson_exact(obj: Any) -> bool:
    """True iff ``orjson.dumps(obj, OPT_SORT_KEYS)`` is byte-identical to
    the normalize+json.dumps reference path (verified empirically over
    every BMP/astral code point and millions of sampled values; see
    tests/test_parse_property.py differential coverage). Read-only walk —
    no tree copy. Risky and excluded:
     - integer-valued floats (Go prints "3", orjson "3.0");
     - floats repr'd in exponent form (orjson '1e21' vs Go/stdlib
       '1e+21') — i.e. |x| >= 1e16 or < 1e-4;
     - NaN/inf (stdlib prints 'Infinity', orjson rejects);
     - ints beyond 2^53 (need the Go float64 round trip);
     - any non-JSON-native type."""
    t = type(obj)
    if t is str:
        return True
    if t is dict:
        for k, v in obj.items():
            if type(k) is not str or not _orjson_exact(v):
                return False
        return True
    if t is list:
        for v in obj:
            if not _orjson_exact(v):
                return False
        return True
    if t is bool or obj is None:
        return True
    if t is int:
        return -_SAFE_INT <= obj <= _SAFE_INT
    if t is float:
        if obj != obj or obj.is_integer():  # NaN / would-be-int
            return False
        a = obj if obj > 0.0 else -obj
        return 1e-4 <= a < 1e16
    return False


# Canonicalization memo (round 5, profiler-driven): telemetry attribute
# trees repeat massively (resource/scope dims by construction, point/log
# attributes from small real-world label sets — 1.34M canonical_dumps
# calls over 200k fixture turns hit a few hundred distinct trees). The
# memo key is the UNSORTED C-side orjson dump of the tree: injective on
# value trees (two structurally different trees cannot print the same
# bytes; two key-orderings of the same dict just miss each other and
# both compute the same canonical output), so memoization is
# semantically invisible. Anything orjson cannot dump (non-str keys,
# lone surrogates, exotic types) skips the memo and takes the reference
# path. Bounded: cleared at 64k entries (dims are few; a pathological
# all-distinct stream degrades to the uncached cost plus one C dump).
_MEMO_MAX = 1 << 16
_memo: dict[bytes, str] = {}


def _memo_safe(obj: Any) -> bool:
    """ADVICE r5 (high): orjson.dumps serializes NaN/Infinity as null, so
    {"a": nan} and {"a": None} would share a memo KEY while canonicalizing
    to different bytes ('{"a":NaN}' vs '{"a":null}') — a call-order-
    dependent collision. Non-finite floats are reachable via go_loads's
    stdlib fallback (it accepts NaN/Infinity literals), so trees
    containing them must skip the memo. Cheap recursive scan; every other
    orjson-dumpable tree keeps the injectivity argument (two structurally
    different finite trees cannot print the same bytes)."""
    t = type(obj)
    if t is float:
        return math.isfinite(obj)
    if t is dict:
        return all(_memo_safe(v) for v in obj.values())
    if t is list:
        return all(_memo_safe(v) for v in obj)
    return True


def canonical_dumps(obj: Any) -> str:
    """Serialize like Go json.Marshal: sorted keys, compact, HTML-escaped.
    ``None`` serializes to ``"null"`` — load-bearing: missing span
    attributes/events/links marshal to the string "null"
    (database/traces.go:130-146 marshals a nil interface{}).

    The hot path (this is >half of parse-stage CPU) is the repeat-tree
    memo above, then C-side orjson.dumps whenever the tree is in the
    byte-exactness-proven domain; anything risky falls back to the
    stdlib reference path."""
    if obj is None:
        # constant fast path: missing span events/links and point
        # exemplars dominate call volume in real telemetry
        return "null"
    key = None
    if _orjson is not None and type(obj) in (dict, list):
        try:
            key = _orjson.dumps(obj)
        except Exception:
            key = None
        # NaN/Infinity serialize as 'null' under orjson, so an unsafe
        # tree's key ALWAYS contains b"null" — the C-speed substring
        # check gates the (rare) Python walk, keeping the hot path one
        # dict probe. Unsafe trees skip the memo entirely (neither
        # looked up nor stored).
        if key is not None and b"null" in key and not _memo_safe(obj):
            key = None
        if key is not None:
            hit = _memo.get(key)
            if hit is not None:
                return hit
    s = None
    if _orjson is not None and _orjson_exact(obj):
        try:
            s = _orjson.dumps(obj, option=_ORJSON_OPTS).decode("utf-8")
        except TypeError:
            # orjson rejects strs containing lone surrogates (reachable:
            # the stdlib DECODER accepts a \ud800 escape that orjson's
            # decoder rejected, so the str arrives here) — fall through
            # to the stdlib reference path, honoring the documented
            # "risky inputs fall back" contract (ADVICE r2 #1).
            s = None
    if s is None:
        s = json.dumps(
            _normalize(obj),
            sort_keys=True,
            separators=(",", ":"),
            ensure_ascii=False,
        )
    for ch, esc in _GO_ESCAPES:
        if ch in s:
            s = s.replace(ch, esc)
    if key is not None:
        if len(_memo) >= _MEMO_MAX:
            _memo.clear()
        _memo[key] = s
    return s


_ORJSON_OPTS = _orjson.OPT_SORT_KEYS if _orjson is not None else 0
