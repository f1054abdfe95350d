"""Per-partition checkpoint manifest for resumable pipeline runs.

Reference analogue: the storage extension persisting file offsets so a
restarted collector resumes tailing where it stopped
(extension/storage/filestorage/client.go:26-87,
internal/stanza/storage.go:52-73). For a batch engine, "resume" means:
the input is split into shards (input files / row ranges); each shard's
outputs land in shard-scoped directories written atomically; a manifest
records completion with lineage (input fragment, row counts, token
checksum, output paths); a rerun skips completed shards.

Manifest layout under <run_dir>/:
    manifest/<shard_id>.json      (atomic rename; presence == complete)
    sinks/<sink>/<shard_id>/*.parquet
    agg/<shard_id>/*.parquet
"""

from __future__ import annotations

import json
import os
import time


class CheckpointManifest:
    def __init__(self, run_dir: str):
        self.run_dir = run_dir
        self.manifest_dir = os.path.join(run_dir, "manifest")
        os.makedirs(self.manifest_dir, exist_ok=True)

    def _path(self, shard_id: str) -> str:
        return os.path.join(self.manifest_dir, f"{shard_id}.json")

    def is_complete(self, shard_id: str) -> bool:
        """A shard is complete only if its record exists AND parses —
        a torn write (crash between rename durability and data
        durability) must re-run the shard, not skip it forever."""
        p = self._path(shard_id)
        if not os.path.exists(p):
            return False
        try:
            with open(p) as f:
                json.load(f)
            return True
        except (json.JSONDecodeError, OSError):
            return False

    def completed_shards(self) -> list[str]:
        return sorted(
            f[: -len(".json")] for f in os.listdir(self.manifest_dir) if f.endswith(".json")
        )

    def mark_complete(self, shard_id: str, record: dict) -> None:
        """Atomically AND durably record shard completion: fsync the
        temp file before the rename (otherwise the rename can survive a
        crash while the contents do not, leaving a truncated record),
        then fsync the directory so the rename itself is durable."""
        record = dict(record, shard_id=shard_id, completed_unix=time.time())
        tmp = self._path(shard_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(record, f, indent=2, sort_keys=True, default=str)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._path(shard_id))
        dfd = os.open(self.manifest_dir, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)

    def read(self, shard_id: str) -> dict:
        with open(self._path(shard_id)) as f:
            return json.load(f)

    def shard_output_dir(self, kind: str, shard_id: str, sink: str | None = None) -> str:
        parts = [self.run_dir, kind] + ([sink] if sink else []) + [shard_id]
        d = os.path.join(*parts)
        os.makedirs(d, exist_ok=True)
        return d
