"""Test/bench doubles for the injected sink clients.

These live in the package (not in tests/) because foreachBatch /
foreachPartition functions are pickled to executor Python workers, which
must be able to import the class's module — worker processes don't share
the pytest module namespace.
"""

from __future__ import annotations

import os
import uuid

from prometheus_remote_kinesis_spark.sinks import PutBatch


class FilePutRecords:
    """Injected PutRecordsFn writing each call's entries into one file in
    a shared directory (executors are separate processes; the shared
    filesystem is the capture channel). Line format: ``key\\tdata``."""

    def __init__(self, out_dir: str, keep_keys: bool = False):
        self.out_dir = out_dir
        self.keep_keys = keep_keys

    def __call__(self, batch: PutBatch) -> list[int]:
        path = os.path.join(self.out_dir, f"{uuid.uuid4().hex}.out")
        with open(path, "wb") as f:
            for key, data in batch.entries:
                if self.keep_keys:
                    f.write(key.encode("utf-8") + b"\t")
                f.write(data)
        return []
