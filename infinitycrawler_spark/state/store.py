"""Snapshot store — versioned-parquet state tables with atomic commits.

Iceberg-style snapshot semantics without Iceberg jars (none exist in
this sandbox; the interface is deliberately Iceberg-shaped so a real
deployment swaps `SnapshotStore` for table appends/overwrites on an
Iceberg catalog):

- layout: ``root/vNNNN/<table>.parquet`` + ``root/vNNNN/manifest.json``;
- a version is committed iff its manifest exists (manifest is written
  last, via atomic rename) — partial writes are invisible;
- ``results`` is append-only: each version stores only that round's
  delta; a read unions deltas ≤ version (snapshot isolation);
- resume: read the latest manifest → exact continuation (round number,
  sequence base, counters, every state table).

Writing state each round doubles as lineage truncation for the
iterative round loop (otherwise Spark plans grow unboundedly).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------ util
    def _vdir(self, version: int) -> str:
        return os.path.join(self.root, f"v{version:05d}")

    def versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.root):
            if name.startswith("v") and os.path.exists(
                    os.path.join(self.root, name, "manifest.json")):
                out.append(int(name[1:]))
        return sorted(out)

    def latest_manifest(self) -> dict | None:
        versions = self.versions()
        if not versions:
            return None
        with open(os.path.join(self._vdir(versions[-1]), "manifest.json")) as f:
            return json.load(f)

    # ---------------------------------------------------------- commit
    def commit(self, version: int, tables: dict[str, DataFrame],
               deltas: dict[str, DataFrame] | None = None,
               meta: dict | None = None,
               blobs: dict[str, bytes] | None = None) -> dict:
        """Write full-state ``tables`` and append-only ``deltas`` for this
        version; manifest lands last (atomic rename)."""
        vdir = self._vdir(version)
        tmp = vdir + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        if os.path.exists(vdir):
            shutil.rmtree(vdir)
        os.makedirs(tmp)
        # the 5-6 table writes are independent Spark actions on distinct
        # paths — submit them concurrently so the commit's wall time is
        # the largest table, not the sum (py4j job submission is
        # thread-safe; the manifest still lands last, so atomicity is
        # unchanged)
        writes = []
        table_paths = {}
        for name, df in tables.items():
            writes.append((df, os.path.join(tmp, f"{name}.parquet")))
            table_paths[name] = f"{name}.parquet"
        delta_paths = {}
        for name, df in (deltas or {}).items():
            writes.append((df, os.path.join(tmp, f"{name}_delta.parquet")))
            delta_paths[name] = f"{name}_delta.parquet"
        if len(writes) > 1:
            from concurrent.futures import ThreadPoolExecutor

            # job-group properties are thread-local (pinned py4j threads):
            # re-attach the caller's group inside each writer thread so
            # cancelJobGroup can interrupt an in-flight commit too
            sc = writes[0][0].sparkSession.sparkContext
            group = sc.getLocalProperty("spark.jobGroup.id")
            desc = sc.getLocalProperty("spark.job.description")
            interrupt = sc.getLocalProperty("spark.job.interruptOnCancel")

            def _write(d, p):
                if group is not None:
                    d.sparkSession.sparkContext.setJobGroup(
                        group, desc or "", interrupt == "true")
                d.write.mode("overwrite").parquet(p)

            with ThreadPoolExecutor(max_workers=min(4, len(writes))) as ex:
                futures = [ex.submit(_write, df, path) for df, path in writes]
                for fut in futures:
                    fut.result()  # propagate the first failure
        else:
            for df, path in writes:
                df.write.mode("overwrite").parquet(path)
        blob_paths = {}
        for name, data in (blobs or {}).items():
            with open(os.path.join(tmp, f"{name}.bin"), "wb") as f:
                f.write(data)
            blob_paths[name] = f"{name}.bin"
        manifest = {
            "version": version,
            "committed_at": time.time(),
            "tables": table_paths,
            "deltas": delta_paths,
            "blobs": blob_paths,
            "meta": meta or {},
        }
        with open(os.path.join(tmp, "manifest.json.tmp"), "w") as f:
            json.dump(manifest, f, indent=1)
        os.rename(os.path.join(tmp, "manifest.json.tmp"),
                  os.path.join(tmp, "manifest.json"))
        os.rename(tmp, vdir)
        return manifest

    # ---------------------------------------------------------- expire
    def expire_snapshots(self, keep_last: int = 2) -> list[int]:
        """Iceberg ``expire_snapshots`` analog: drop the full-state
        tables and blobs of all but the newest ``keep_last`` committed
        versions, KEEPING every version's manifest and append-only
        ``*_delta`` files so ``read_deltas``/lineage reads and the
        newest versions' resume points stay intact. Storage becomes
        O(keep_last · state + total deltas) instead of
        O(rounds · state) — the difference between a bounded store and
        an unbounded one on a 10^10-URL crawl. Returns the versions
        expired by this call."""
        if keep_last < 1:
            raise ValueError("expire_snapshots: keep_last must be >= 1")
        expired = []
        for v in self.versions()[:-keep_last]:
            vdir = self._vdir(v)
            mpath = os.path.join(vdir, "manifest.json")
            with open(mpath) as f:
                manifest = json.load(f)
            if manifest.get("expired"):
                continue
            # Iceberg order: mark the manifest expired FIRST (atomic
            # rename), then delete files — a crash mid-expiry leaks
            # orphan files but never leaves a manifest advertising
            # tables that no longer exist
            doomed = (list(manifest.get("tables", {}).values())
                      + list(manifest.get("blobs", {}).values()))
            manifest["expired"] = True
            manifest["tables"] = {}
            manifest["blobs"] = {}
            tmp = mpath + ".tmp"
            with open(tmp, "w") as f:
                json.dump(manifest, f, indent=1)
            os.rename(tmp, mpath)  # manifest swap stays atomic
            for rel in doomed:
                p = os.path.join(vdir, rel)
                if os.path.isdir(p):
                    shutil.rmtree(p)
                elif os.path.exists(p):
                    os.remove(p)
            expired.append(v)
        return expired

    # ------------------------------------------------------------ read
    def read_table(self, spark: SparkSession, version: int, name: str) -> DataFrame:
        return spark.read.parquet(os.path.join(self._vdir(version), f"{name}.parquet"))

    def read_blob(self, version: int, name: str) -> bytes | None:
        path = os.path.join(self._vdir(version), f"{name}.bin")
        if not os.path.exists(path):
            return None
        with open(path, "rb") as f:
            return f.read()

    def read_deltas(self, spark: SparkSession, upto_version: int, name: str) -> DataFrame | None:
        paths = []
        for v in self.versions():
            if v > upto_version:
                break
            p = os.path.join(self._vdir(v), f"{name}_delta.parquet")
            if os.path.exists(p):
                paths.append(p)
        if not paths:
            return None
        # deltas written before a schema upgrade (e.g. a resumed crawl over
        # a pre-`attempts` store) lack the new nullable columns; without
        # mergeSchema the unioned schema is inferred from an arbitrary file
        # and the new columns nondeterministically vanish
        return spark.read.option("mergeSchema", "true").parquet(*paths)
