"""Dynamic-value coercion per the reference's ingest rules.

Mirrors insertToAttributeVal (internal/stanza/converter.go:432-471):
bool → bool; all int/uint widths → int64; float32/64 → double;
bytes → utf-8 string; dict/list → recurse; anything else → str(value).
Used when normalizing JSON-parsed dynamic fields into Arrow columns.
"""

from __future__ import annotations

from typing import Any


def coerce_value(v: Any) -> Any:
    if v is None or isinstance(v, bool):
        return v
    if isinstance(v, int):
        return int(v)  # all widths collapse to int64 downstream
    if isinstance(v, float):
        return float(v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).decode("utf-8", errors="replace")
    if isinstance(v, str):
        return v
    if isinstance(v, dict):
        return {str(k): coerce_value(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [coerce_value(x) for x in v]
    return str(v)
