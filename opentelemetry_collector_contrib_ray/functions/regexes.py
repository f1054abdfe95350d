"""Vectorized named-group regex extraction (stanza regex_parser kernel).

Uses ``pyarrow.compute.extract_regex`` (RE2) when the pattern compiles
under RE2, falling back to pandas ``str.extract`` (Python re) otherwise.
Non-matching rows yield nulls — the caller decides drop/keep semantics,
mirroring stanza's on-error behaviors.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc


def group_names(pattern: str) -> list[str]:
    return list(re.compile(pattern).groupindex.keys())


def extract_named(arr: pa.Array, pattern: str) -> dict[str, pa.Array]:
    """Apply a named-group regex to a string array → {group: string array}.

    Null where the row does not match (stanza regex_parser errors on
    non-match; we surface null and let the stage count/drop).
    """
    names = group_names(pattern)
    try:
        struct = pc.extract_regex(arr, pattern=pattern)
        return {n: pc.struct_field(struct, n) for n in names}
    except pa.ArrowInvalid:
        # RE2 rejects lookarounds/backrefs — pandas fallback
        import pandas as pd

        s = pd.Series(arr.to_pandas())
        df = s.str.extract(pattern)
        return {n: pa.array(df[n], type=pa.string()) for n in names}
