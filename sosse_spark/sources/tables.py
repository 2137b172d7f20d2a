"""Snapshot table layer: atomic, resumable parquet tables (Iceberg-lite).

The north rule requires the frontier to live in partitioned snapshot
tables with checkpoint/resume (BASELINE.json north_rule).  No Iceberg
runtime JAR is available offline, so this module implements a minimal
snapshot protocol over plain parquet with the same observable
guarantees, behind an interface a real Iceberg catalog could replace:

  * every commit writes a NEW immutable snapshot directory, then a
    manifest JSON, then atomically flips a LATEST pointer file
    (tmp-write + os.replace — atomic on POSIX).  A crash mid-commit
    leaves the previous snapshot intact: resume = read LATEST.
  * `SnapshotTable` is hash-bucketed on a caller-supplied key column
    (`bucket`).  A MERGE only REWRITES THE TOUCHED BUCKETS: the new
    manifest maps each bucket to the snapshot directory that currently
    owns it, so unchanged buckets are never rewritten or copied.  At a
    10^10-row frontier with 2^10 buckets, a round that touches 5% of
    hosts rewrites ~5% of the data.
  * `AppendTable` is an append-only log (documents/links/metrics):
    each commit adds one directory; the manifest is the list of live
    directories.

This replaces the reference's PostgreSQL row store + CAS claims
(se/document.py:901-946): snapshot isolation makes the per-round claim
atomic at the table level, so no per-row compare-and-swap is needed.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["SnapshotTable", "AppendTable", "atomic_write"]


def atomic_write(path: str, content: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(content)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, path)


class _TableBase:
    def __init__(self, root: str, name: str):
        self.dir = os.path.join(root, name)
        os.makedirs(self.dir, exist_ok=True)

    def _latest_path(self) -> str:
        return os.path.join(self.dir, "LATEST")

    def latest(self) -> Optional[int]:
        try:
            with open(self._latest_path()) as fh:
                return int(fh.read().strip())
        except FileNotFoundError:
            return None

    def _manifest_path(self, snap: int) -> str:
        return os.path.join(self.dir, f"manifest-{snap:06d}.json")

    def manifest(self, snap: Optional[int] = None) -> Optional[dict]:
        snap = self.latest() if snap is None else snap
        if snap is None:
            return None
        with open(self._manifest_path(snap)) as fh:
            return json.load(fh)

    def _commit_manifest(self, snap: int, manifest: dict) -> None:
        manifest["snapshot"] = snap
        manifest["committed_at"] = time.time()
        atomic_write(self._manifest_path(snap), json.dumps(manifest))
        atomic_write(self._latest_path(), str(snap))


class SnapshotTable(_TableBase):
    """Hash-bucketed snapshot table with bucket-granular MERGE rewrite.

    Rows must carry an int `bucket` column = pmod(xxhash64(key), n_buckets).
    """

    def __init__(self, root: str, name: str, n_buckets: int = 16):
        super().__init__(root, name)
        self.n_buckets = n_buckets

    def read(self, spark: SparkSession, snap: Optional[int] = None) -> Optional[DataFrame]:
        m = self.manifest(snap)
        if m is None:
            return None
        self.n_buckets = m["n_buckets"]
        # group buckets by owning snapshot dir → one parquet read per dir
        by_dir: dict[str, list[str]] = {}
        for bucket, snap_dir in m["buckets"].items():
            by_dir.setdefault(snap_dir, []).append(bucket)
        parts = []
        for snap_dir, buckets in sorted(by_dir.items()):
            base = os.path.join(self.dir, snap_dir)
            # a bucket whose post-merge contents were EMPTY has no
            # bucket= subdir in its owning snapshot (parquet writes no
            # partition dir for zero rows) — that bucket IS empty;
            # pointing it back at an older dir would resurrect rows
            paths = [
                p
                for b in sorted(buckets, key=int)
                if os.path.isdir(p := os.path.join(base, f"bucket={b}"))
            ]
            if paths:
                parts.append(spark.read.option("basePath", base).parquet(*paths))
        if not parts:
            return None
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    def commit(
        self,
        spark: SparkSession,
        changed: DataFrame,
        round_no: int,
        extra: Optional[dict] = None,
        changed_buckets: Optional[list[int]] = None,
    ) -> int:
        """Commit `changed` (full post-merge contents of its buckets).

        Buckets NOT present in `changed` keep their previous snapshot
        directory untouched — this is the scale path: only hot buckets
        are rewritten.  Pass `changed_buckets` when the caller already
        knows them to save the distinct scan.
        """
        prev = self.manifest()
        snap = (prev["snapshot"] if prev else 0) + 1
        snap_dir = f"snap-{snap:06d}"
        out = os.path.join(self.dir, snap_dir)

        if changed_buckets is None:
            changed_buckets = [r["bucket"] for r in changed.select("bucket").distinct().collect()]
        # one task per touched bucket — keeps file counts (and later read
        # fan-in) proportional to touched buckets, not tasks × buckets
        changed.repartition("bucket").write.mode("overwrite").partitionBy("bucket").parquet(out)

        buckets = dict(prev["buckets"]) if prev else {}
        for b in changed_buckets:
            buckets[str(b)] = snap_dir
        self._commit_manifest(
            snap,
            {
                "n_buckets": self.n_buckets,
                "round": round_no,
                "buckets": buckets,
                **(extra or {}),
            },
        )
        return snap

    @staticmethod
    def with_bucket(df: DataFrame, key_col: str, n_buckets: int) -> DataFrame:
        return df.withColumn("bucket", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int"))

    def vacuum(self, keep_last: int = 2) -> list[str]:
        """Delete snapshot dirs (and manifests) no longer reachable from
        the last `keep_last` manifests — the disk-growth bound for a
        long-running crawl, where every round adds a snapshot dir but
        only the buckets it rewrote are live.

        keep_last >= 2 preserves crash-repair headroom: rollback_to_round
        only ever rewinds across the one uncommitted round, so the
        previous manifest (and every dir it references) must survive.
        Returns the deleted directory names."""
        import shutil

        latest = self.latest()
        if latest is None:
            return []
        floor = max(latest - keep_last + 1, 1)
        referenced: set[str] = set()
        for snap in range(floor, latest + 1):
            m = self.manifest(snap)
            referenced.update(m["buckets"].values())
        deleted = []
        for name in sorted(os.listdir(self.dir)):
            if name.startswith("snap-") and name not in referenced:
                if int(name.split("-")[1]) >= floor:
                    continue  # a dir of a kept manifest generation
                shutil.rmtree(os.path.join(self.dir, name))
                deleted.append(name)
            elif name.startswith("manifest-"):
                if int(name.split("-")[1].split(".")[0]) < floor:
                    os.remove(os.path.join(self.dir, name))
        return deleted

    def rollback_to_round(self, round_no: int) -> None:
        """Crash repair for snapshot tables committed BEFORE the round's
        frontier commit point: rewind LATEST to the newest snapshot whose
        round predates `round_no`, so a replayed round recomputes the
        table from the same state it saw the first time.  Snapshot dirs
        are immutable and retained, so this is a pointer flip; the replay
        then overwrites the orphaned higher snapshots in place."""
        snap = self.latest()
        if snap is None:
            return
        while snap > 0 and self.manifest(snap)["round"] >= round_no:
            snap -= 1
        if snap == 0:
            os.remove(self._latest_path())
        else:
            atomic_write(self._latest_path(), str(snap))


class AppendTable(_TableBase):
    """Append-only table (documents / links / metrics).

    Each append dir is tagged with its crawl round so a crashed,
    re-run round can be logically truncated (`truncate_from`) before
    its appends are replayed — exactly-once across crash points.
    """

    @staticmethod
    def _entries(m: dict) -> list[dict]:
        return [{"dir": e, "round": m.get("round", 0)} if isinstance(e, str) else e for e in m["dirs"]]

    def read(self, spark: SparkSession, snap: Optional[int] = None) -> Optional[DataFrame]:
        m = self.manifest(snap)
        if m is None or not m["dirs"]:
            return None
        # mergeSchema: an append-log can span engine versions — dirs
        # written before a column existed (e.g. documents.webhooks_result)
        # must still read, with the missing column null-filled, instead
        # of the schema depending on which file Spark samples first
        return spark.read.option("mergeSchema", "true").parquet(
            *[os.path.join(self.dir, e["dir"]) for e in self._entries(m)]
        )

    def append(self, spark: SparkSession, df: DataFrame, round_no: int) -> int:
        prev = self.manifest()
        snap = (prev["snapshot"] if prev else 0) + 1
        snap_dir = f"snap-{snap:06d}"
        df.coalesce(max(df.sparkSession.sparkContext.defaultParallelism // 4, 1)).write.mode(
            "overwrite"
        ).parquet(os.path.join(self.dir, snap_dir))
        dirs = (self._entries(prev) if prev else []) + [{"dir": snap_dir, "round": round_no}]
        self._commit_manifest(snap, {"round": round_no, "dirs": dirs})
        return snap

    def vacuum(self) -> list[str]:
        """Delete append dirs no longer referenced by the LATEST
        manifest (orphans left by truncate_from crash repair) and
        manifests older than LATEST.  Returns deleted dir names."""
        import shutil

        m = self.manifest()
        if m is None:
            return []
        live = {e["dir"] for e in self._entries(m)}
        # a delete_where rewrite parent ("rewrite-NNNNNN") is live as
        # long as any manifest entry points inside it
        live_parents = {d.split("/", 1)[0] for d in live}
        deleted = []
        for name in sorted(os.listdir(self.dir)):
            if name.startswith(("snap-", "rewrite-")) and name not in live and name not in live_parents:
                shutil.rmtree(os.path.join(self.dir, name))
                deleted.append(name)
            elif name.startswith("manifest-") and int(name.split("-")[1].split(".")[0]) < m["snapshot"]:
                os.remove(os.path.join(self.dir, name))
        return deleted

    def delete_where(self, spark: SparkSession, keys: DataFrame, key_cols: list[str]) -> dict:
        """Physically remove rows matching `keys` (joined on `key_cols`)
        — the append-log half of a mass delete (se/management/commands/
        delete_documents.py + Document.delete cascade).

        Partition-pruned compaction: ONE Spark job finds which append
        dirs contain hits (input_file_name), then ONE job rewrites only
        those dirs (left_anti join against the keys) via a partitionBy
        write that keeps per-dir identity — untouched dirs (usually the
        overwhelming majority of a long crawl's log) keep their files
        byte-for-byte.  Rewritten entries keep their original round tag
        so truncate_from crash repair stays correct.  The manifest swap
        is atomic; a crash mid-rewrite leaves orphan dirs that vacuum()
        removes.  Returns {"rows_deleted", "dirs_rewritten"}."""
        from pyspark.sql import functions as F

        m = self.manifest()
        if m is None or not m["dirs"]:
            return {"rows_deleted": 0, "dirs_rewritten": 0}
        entries = self._entries(m)

        # entry name of the dir a row came from, extracted from the
        # machine-generated tail of the input file path ("snap-NNNNNN"
        # or "rewrite-NNNNNN/_idx=K", immediately enclosing the part
        # file).  Anchoring on the FILENAME position — not on the
        # absolute table root — makes this immune to the varying URI
        # prefix forms of input_file_name() (slash count, percent
        # escapes for e.g. spaces in the root path): the entry names
        # themselves are plain [a-z0-9_=/-] and survive verbatim.  One
        # constant-size regex regardless of manifest length (a CASE
        # chain over entries would grow past janino's method limit on
        # a long append log — the CLAUDE.md expression-SIZE trap).
        def rel_dir_of():
            return F.regexp_extract(
                F.input_file_name(),
                r"/(rewrite-\d+/_idx=\d+|snap-\d+)/[^/]+$",
                1,
            )

        uniq = keys.select(*key_cols).distinct()
        full = spark.read.option("mergeSchema", "true").parquet(
            *[os.path.join(self.dir, e["dir"]) for e in entries]
        ).withColumn("_dir", rel_dir_of())
        touched_rows = full.join(uniq, key_cols, "left_semi").groupBy("_dir").count().collect()
        by_dir = {e["dir"]: e for e in entries}
        touched = {r["_dir"]: r["count"] for r in touched_rows if r["_dir"] in by_dir}
        n_deleted = sum(touched.values())
        unresolved = sum(r["count"] for r in touched_rows if r["_dir"] not in by_dir)
        if unresolved:
            # never silently strand rows the caller asked to delete
            raise RuntimeError(
                f"delete_where could not resolve the append dir of {unresolved} "
                f"matching rows under {self.dir!r}"
            )
        if not touched:
            return {"rows_deleted": 0, "dirs_rewritten": 0}
        snap = m["snapshot"] + 1
        rw_parent = f"rewrite-{snap:06d}"
        idx_of = {d: str(i) for i, d in enumerate(sorted(touched))}
        idx_map = spark.createDataFrame(
            [(d, i) for d, i in idx_of.items()], "_dir string, _idx string"
        )
        kept = (
            spark.read.option("mergeSchema", "true")
            .parquet(*[os.path.join(self.dir, d) for d in sorted(touched)])
            .withColumn("_dir", rel_dir_of())
            .join(uniq, key_cols, "left_anti")
            .join(F.broadcast(idx_map), "_dir")
            .drop("_dir")
        )
        kept.write.mode("overwrite").partitionBy("_idx").parquet(os.path.join(self.dir, rw_parent))
        new_entries = []
        for e in entries:
            if e["dir"] not in touched:
                new_entries.append(e)
                continue
            sub = f"{rw_parent}/_idx={idx_of[e['dir']]}"
            if os.path.isdir(os.path.join(self.dir, sub)):  # fully-deleted dirs vanish
                new_entries.append({"dir": sub, "round": e["round"]})
        self._commit_manifest(snap, {"round": m.get("round", 0), "dirs": new_entries})
        return {"rows_deleted": n_deleted, "dirs_rewritten": len(touched)}

    def truncate_from(self, round_no: int) -> None:
        """Drop append dirs written by rounds >= round_no (crash repair:
        a round that never reached its frontier commit gets replayed, so
        its partial appends must not survive)."""
        prev = self.manifest()
        if prev is None:
            return
        kept = [e for e in self._entries(prev) if e["round"] < round_no]
        if len(kept) == len(prev["dirs"]):
            return
        snap = prev["snapshot"] + 1
        self._commit_manifest(snap, {"round": round_no, "dirs": kept})
