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


def go_loads(text: str) -> Any:
    """Decode JSON the way Go decodes into ``map[string]interface{}``:
    every number becomes float64. Like ``json.Decoder.Decode`` we accept
    (and ignore) trailing content after the first JSON value
    (handlers/handler_common.go:35 uses a streaming decoder).
    Raises ValueError on empty input (EOF) and json.JSONDecodeError on
    malformed input.
    """
    stripped = text.lstrip()
    if not stripped:
        raise ValueError("EOF")  # empty body — handler_common.go:38-41
    obj, _end = json.JSONDecoder(parse_int=float, parse_float=float).raw_decode(stripped)
    return obj


def _normalize(obj: Any) -> Any:
    """Prepare a decoded tree for Go-compatible dumping: integer-valued
    floats below the 'f'-format cutoff become ints so they print as Go
    prints float64 ("3" not "3.0")."""
    if isinstance(obj, float):
        if math.isfinite(obj) and obj.is_integer() and abs(obj) < _F_CUTOFF:
            return int(obj)
        return obj
    if isinstance(obj, dict):
        return {k: _normalize(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_normalize(v) for v in obj]
    return obj


def canonical_dumps(obj: Any) -> str:
    """Serialize like Go json.Marshal: sorted keys, compact, HTML-escaped.
    ``None`` serializes to ``"null"`` — load-bearing: missing span
    attributes/events/links marshal to the string "null"
    (database/traces.go:130-146 marshals a nil interface{}).
    """
    s = json.dumps(
        _normalize(obj),
        sort_keys=True,
        separators=(",", ":"),
        ensure_ascii=False,
    )
    for ch, esc in _GO_ESCAPES:
        if ch in s:
            s = s.replace(ch, esc)
    return s
