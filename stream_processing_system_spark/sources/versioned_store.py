"""Versioned dataset store — the analytics-engine mapping of the
reference's SDFS blob layer (SURVEY.md §2.10 K4, §3.3).

SDFS semantics: put creates a new version (version counter per name,
`Nimbus.go:461-490`), get reads latest or an explicit version
(`daemon/daemon.go:341-393`, get-versions `:614-675`), plus
delete/ls. Replication (4 replicas, re-replication on failure) is
the storage layer's job in a Spark deployment (HDFS/S3), not the
engine's — exactly as SURVEY.md §1.5 maps it.

Layout: <root>/<name>/v=<N>/ parquet directories. Writes are
write-new-directory-then-visible, so concurrent readers of v=N are
never disturbed (same immutability SDFS gets from whole-file puts).
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

_VDIR = re.compile(r"^v=(\d+)$")


class VersionedStore:
    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _name_dir(self, name: str) -> str:
        if "/" in name or name.startswith("."):
            raise ValueError(f"bad dataset name {name!r}")
        return os.path.join(self.root, name)

    def versions(self, name: str) -> list[int]:
        """SDFS get-versions (`daemon/daemon.go:614-675`)."""
        d = self._name_dir(name)
        if not os.path.isdir(d):
            return []
        out = []
        for entry in os.listdir(d):
            m = _VDIR.match(entry)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def put(self, df: DataFrame, name: str) -> int:
        """SDFS put (`daemon/daemon.go:168-281`): write as the next
        version; returns the new version number."""
        version = (self.versions(name) or [0])[-1] + 1
        df.write.mode("errorifexists").parquet(
            os.path.join(self._name_dir(name), f"v={version}")
        )
        return version

    def put_idempotent(self, df: DataFrame, name: str, version: int) -> int:
        """Write an EXPLICIT version with overwrite — the foreachBatch
        adapter: keyed by streaming epoch_id, a replayed micro-batch
        rewrites its own version instead of minting a duplicate, which
        is what turns checkpoint-replay at-least-once into
        exactly-once versions (see streaming/jobs.py
        stream_wordcount_to_versioned_store)."""
        df.write.mode("overwrite").parquet(
            os.path.join(self._name_dir(name), f"v={version}")
        )
        return version

    def get(self, spark: SparkSession, name: str, version: int | None = None) -> DataFrame:
        """SDFS get (`daemon/daemon.go:341-393`): latest version by
        default, or an explicit one."""
        versions = self.versions(name)
        if not versions:
            raise FileNotFoundError(f"no dataset {name!r} in {self.root}")
        v = versions[-1] if version is None else version
        if v not in versions:
            raise FileNotFoundError(f"{name!r} has versions {versions}, not {v}")
        return spark.read.parquet(os.path.join(self._name_dir(name), f"v={v}"))

    def ls(self) -> list[str]:
        """SDFS ls (`daemon/daemon.go:484-511`)."""
        return sorted(
            n for n in os.listdir(self.root) if os.path.isdir(os.path.join(self.root, n))
        )

    def delete(self, name: str) -> None:
        """SDFS delete (`daemon/daemon.go:430-481`): removes all
        versions of the dataset."""
        d = self._name_dir(name)
        if os.path.isdir(d):
            shutil.rmtree(d)

    def vacuum(self, name: str, keep_last: int = 2) -> list[int]:
        """Retention: drop all but the newest `keep_last` versions
        (the VACUUM every versioned table needs — without it a
        streaming sink minting one version per micro-batch grows
        storage without bound). Deletes oldest-first so a concurrent
        reader of a recent version is never disturbed; returns the
        removed version numbers. The reference's SDFS keeps every
        version forever and offers only whole-dataset delete
        (`daemon/daemon.go:430-481`); bounded retention is the
        production necessity layered on top."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        versions = self.versions(name)
        doomed = versions[:-keep_last] if len(versions) > keep_last else []
        for v in doomed:
            shutil.rmtree(os.path.join(self._name_dir(name), f"v={v}"))
        return doomed
