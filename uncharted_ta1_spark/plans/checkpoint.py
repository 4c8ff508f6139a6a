"""Per-partition checkpoint log with lineage + row/byte metrics.

Reference analog: the per-task JSON result cache keyed by content+config hash
(``tasks/common/task.py:188-212``; sha256 config hashing
``tasks/metadata_extraction/metadata_extraction.py:453-476``), the
all-or-nothing cached-prediction join
(``tasks/point_extraction/entities.py:133-159``, J1) and the per-request
metrics emission (``tasks/common/request_client.py:374-458``, ST7).

Semantics: work is split into ``buckets`` by a stable hash of the entity key.
A bucket is either fully committed (a log row exists for
``(op_id, config_hash, bucket)``) or not done at all — resume = skip
committed buckets (the anti-join of the work list against the log).  Config
changes rotate ``config_hash``, invalidating every bucket at once, exactly
like the reference's cache keys embedding model id + params.

On a real deployment this log is an Iceberg table and commits ride Iceberg's
atomic snapshot; here it is a parquet directory with one file per commit
(append-only, last-write-wins is irrelevant because commits are idempotent).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

LOG_SCHEMA = pa.schema(
    [
        ("op_id", pa.string()),
        ("config_hash", pa.string()),
        ("bucket", pa.int32()),
        ("rows_written", pa.int64()),
        ("bytes_written", pa.int64()),
        ("committed_at_epoch", pa.int64()),
    ]
)


def config_hash(config: dict) -> str:
    """sha256 of the canonical-JSON config — the cache key discriminator."""
    blob = json.dumps(config, sort_keys=True, separators=(",", ":")).encode()
    return hashlib.sha256(blob).hexdigest()


class CheckpointLog:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def completed_buckets(self, op_id: str, cfg_hash: str) -> set[int]:
        done: set[int] = set()
        for fname in sorted(os.listdir(self.path)):
            if not fname.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(self.path, fname))
            for row in t.to_pylist():
                if row["op_id"] == op_id and row["config_hash"] == cfg_hash:
                    done.add(row["bucket"])
        return done

    def commit(
        self,
        op_id: str,
        cfg_hash: str,
        bucket: int,
        rows_written: int,
        bytes_written: int,
    ) -> None:
        table = pa.Table.from_pylist(
            [
                {
                    "op_id": op_id,
                    "config_hash": cfg_hash,
                    "bucket": int(bucket),
                    "rows_written": int(rows_written),
                    "bytes_written": int(bytes_written),
                    "committed_at_epoch": int(time.time()),
                }
            ],
            schema=LOG_SCHEMA,
        )
        tmp = os.path.join(self.path, f".tmp-{uuid.uuid4().hex}.parquet")
        final = tmp.replace(".tmp-", "commit-")
        pq.write_table(table, tmp)
        os.rename(tmp, final)  # atomic publish

    def lineage(self) -> list[dict]:
        out: list[dict] = []
        for fname in sorted(os.listdir(self.path)):
            if fname.endswith(".parquet"):
                out.extend(pq.read_table(os.path.join(self.path, fname)).to_pylist())
        return out
