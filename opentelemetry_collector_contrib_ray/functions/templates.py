"""Attribute templates: render "%{attr}" placeholders from columns.

Mirrors sumologicexporter source templates
(exporter/sumologicexporter/source_format.go:43-91): placeholders are
replaced by the attribute's string value, missing attributes render as
the empty string.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_PLACEHOLDER = re.compile(r"\%\{(\w+)\}")


def render_template(template: str, batch: pa.Table) -> pa.Array:
    """Render the template once per row from the batch's columns."""
    names = _PLACEHOLDER.findall(template)
    parts = _PLACEHOLDER.split(template)  # [lit, name, lit, name, ..., lit]
    n = len(batch)
    out = np.full(n, parts[0], dtype=object)
    for i, name in enumerate(names):
        if name in batch.column_names:
            col = batch[name].to_numpy(zero_copy_only=False).astype(object)
            col = np.where([v is None for v in col], "", col.astype(str))
        else:
            col = np.full(n, "", dtype=object)
        out = np.char.add(out.astype(str), col.astype(str))
        out = np.char.add(out, parts[2 * i + 2])
    return pa.array(out, type=pa.string())
