"""Pipeline metrics: per-stage row counters, mirroring the reference's
processor metrics (e.g. groupbyattrsprocessor/metrics.go
num_grouped_logs / num_non_grouped_logs; lokiexporter dropped counts).

Batch-engine shape: counters are accumulated inside stages as extra
tiny Arrow tables or computed from stage outputs, then persisted with
the checkpoint manifest. This module is a plain dict-backed recorder —
the source of truth for "rows in/out per stage, dropped, grouped".
"""

from __future__ import annotations

import json
import os
from collections import defaultdict


class MetricsRecorder:
    def __init__(self):
        self.counters: dict[str, int] = defaultdict(int)

    def add(self, name: str, value: int = 1) -> None:
        self.counters[name] += int(value)

    def merge(self, other: dict) -> None:
        for k, v in other.items():
            self.counters[k] += int(v)

    def snapshot(self) -> dict:
        return dict(self.counters)

    def dump(self, path: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.snapshot(), f, indent=2, sort_keys=True)
        os.replace(tmp, path)
