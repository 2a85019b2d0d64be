"""Snapshot-manifest tables: an Iceberg-shaped storage seam on parquet.

The north rule targets "Iceberg tables of source-code repositories";
the Iceberg runtime jar is not in this container, so this module
implements the SEMANTICS the engine actually depends on — atomic
snapshot commits, time travel, and an incremental (appended-files)
scan — as a thin manifest layer over plain parquet, behind the same
``spark.read.parquet`` seam a real catalog would use. Swapping in real
Iceberg is a config change at the read/write call sites, not a
redesign.

Layout (one directory per table):

    <table>/data-<token>/part-*.parquet   immutable data files
    <table>/snapshots/<seq>.json          one manifest per snapshot

A manifest lists EVERY live data file of its snapshot (the flattened
form of Iceberg's manifest list) plus the files its commit ADDED, its
parent id, commit mode, and the table SCHEMA as of that snapshot
(evolved union-by-name at commit: appends may add columns, never
change a column's type — see _evolve_schema). Readers plan from one
manifest read and declare the manifest schema on the scan, so old
files read NULL for later-added columns with ZERO parquet footer
reads; no directory listing of data ever happens, so stale files from
failed commits are invisible (and garbage-collectable).

Commit protocol — atomic + optimistic, no locks:

1. data files are written to a fresh ``data-<token>/`` directory
   (never mutated after);
2. the manifest is staged to a temp name and published with
   ``os.link(tmp, final)`` — link fails with EEXIST if another
   committer took the same sequence number, in which case the commit
   RE-READS the now-current snapshot, rebases its live-file list, and
   retries with the next number. Data files never need rewriting on
   conflict (append/overwrite commute with everything except another
   overwrite, exactly Iceberg's optimistic model).

Scale notes (10^12 files): a snapshot whose live-file list exceeds
``shard_size`` stores it SHARDED — the manifest holds shard-file names
(``file_shards``) and each immutable ``shard-*.json`` under
``snapshots/`` holds one slice, exactly Iceberg's manifest-list ->
manifest -> data-file tree flattened one level. The root manifest
stays O(live/shard_size) no matter the table size, an append rewrites
only the TAIL shard (earlier shards are reused byte-identical from the
parent — the commit cost of a 10^9-file table's append is one shard,
not the list), and planning streams shard-by-shard. ``added`` stays
inline (delta-sized by definition). Commits move zero existing bytes
(append and overwrite both only WRITE new files), and the incremental
scan reads ONLY the files added after a snapshot — the input shape
kg/delta.py's re-extraction wants, without even a diff join for
append-only sources.

The reference has no storage layer (rdf-tabular reads files and HTTP,
reader.rb); this module is engine infrastructure for the KG pipeline's
resumable/incremental contract.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _evolve_schema(parent: dict, incoming: dict) -> dict:
    """Union-by-name schema evolution (Iceberg's add-column rule):
    parent columns keep their position and type, columns new in
    *incoming* append in their written order. A same-named column with
    a DIFFERENT type raises — type promotion needs an explicit
    overwrite, silently reading an int column as string corrupts every
    old row. Dropping a column is a non-event: old files simply stop
    being read for it only when an overwrite resets the schema;
    until then readers see NULL for files written without it."""
    by_name = {f["name"]: f for f in parent["fields"]}
    out = list(parent["fields"])
    for f in incoming["fields"]:
        prev = by_name.get(f["name"])
        if prev is None:
            out.append(f)
        elif prev["type"] != f["type"]:
            raise ValueError(
                f"schema evolution cannot change column {f['name']!r} "
                f"from {prev['type']!r} to {f['type']!r}; use "
                "mode='overwrite' to reset the schema")
    return {"type": "struct", "fields": out}


class SnapshotTable:
    """A directory-backed snapshot table (see module docstring).

    *shard_size*: live-file lists are kept as FULL immutable shard files
    of exactly this many entries plus one inline partial tail in the
    manifest — a child snapshot reuses its parent's full shards by name,
    so append commit cost and root-manifest size are independent of the
    table's total file count. The default keeps single-manifest behavior
    for every table below ~10^5 files."""

    def __init__(self, path: str, shard_size: int = 100_000):
        if shard_size < 1:
            raise ValueError("shard_size must be >= 1")
        self.path = path
        self.shard_size = shard_size
        os.makedirs(self._snap_dir(), exist_ok=True)

    # -- manifest plumbing ------------------------------------------------
    def _snap_dir(self) -> str:
        return os.path.join(self.path, "snapshots")

    def _snap_file(self, sid: int) -> str:
        return os.path.join(self._snap_dir(), f"{sid:012d}.json")

    def history(self) -> list[int]:
        """All snapshot ids, oldest first."""
        return sorted(
            int(f[:-5]) for f in os.listdir(self._snap_dir())
            if f.endswith(".json") and f[:-5].isdigit())

    def current_snapshot_id(self) -> int | None:
        ids = self.history()
        return ids[-1] if ids else None

    def manifest(self, sid: int) -> dict:
        with open(self._snap_file(sid)) as fh:
            return json.load(fh)

    def _files(self, m: dict) -> list[str]:
        """A manifest's full live-file list: the contents of its full
        shards (in order) plus the inline partial tail. Manifests written
        before sharding existed have no ``file_shards`` key — their
        ``files`` IS the whole list, which this concat reproduces."""
        out: list[str] = []
        for name in m.get("file_shards", []):
            with open(os.path.join(self._snap_dir(), name)) as fh:
                out.extend(json.load(fh))
        return out + m["files"]

    def _shard_out(self, shards: list[str], tail: list[str],
                   added: list[str], token: str, attempt: int
                   ) -> tuple[list[str], list[str]]:
        """Extend (full shards, inline tail) with *added*: overflowed
        slices become NEW immutable shard files named by this commit's
        token+attempt (a lost publish race orphans them; expire_snapshots
        age-sweeps unreferenced shards). Parent shards pass through by
        NAME — an append to a 10^9-file table writes O(added/shard_size)
        shards, never the whole list."""
        shards = list(shards)
        tail = tail + added
        i = 0
        while len(tail) >= self.shard_size:
            chunk, tail = tail[:self.shard_size], tail[self.shard_size:]
            name = f"shard-{token}-{attempt}-{i:06d}.json"
            with open(os.path.join(self._snap_dir(), name), "w") as fh:
                json.dump(chunk, fh)
            shards.append(name)
            i += 1
        return shards, tail

    # -- write -------------------------------------------------------------
    def commit(self, df: DataFrame, mode: str = "append",
               require_parent: int | None = None) -> int:
        """Write *df* as new immutable data files and publish the next
        snapshot atomically. ``mode='append'`` keeps the previous
        snapshot's files live; ``'overwrite'`` replaces them (the old
        files stay on disk for time travel). ``require_parent`` makes
        the publish CONDITIONAL: if the current snapshot is no longer
        that id at publish time, the commit aborts instead of rebasing —
        the guard a rewrite needs (its data was derived FROM a specific
        snapshot; rebasing would silently drop a concurrent append's
        rows, where append/overwrite rebases stay correct because their
        data is independent of the parent). Returns the snapshot id."""
        if mode not in ("append", "overwrite", "compact"):
            raise ValueError(f"unknown commit mode {mode!r}")
        df_schema = json.loads(df.schema.json())
        token = uuid.uuid4().hex[:12]
        data_dir = f"data-{token}"
        df.write.parquet(os.path.join(self.path, data_dir))
        added = sorted(
            f"{data_dir}/{f}"
            for f in os.listdir(os.path.join(self.path, data_dir))
            if f.startswith("part-") and f.endswith(".parquet"))
        tmp = os.path.join(self._snap_dir(), f".tmp-{token}.json")
        try:
            attempt = 0
            while True:
                parent = self.current_snapshot_id()
                if require_parent is not None and parent != require_parent:
                    raise RuntimeError(
                        f"conditional commit aborted: parent moved from "
                        f"{require_parent} to {parent} (re-derive and retry)")
                if mode in ("overwrite", "compact") or parent is None:
                    base_shards: list[str] = []
                    base_tail: list[str] = []
                    schema = df_schema if mode != "compact" or parent is None \
                        else self.manifest(parent).get("schema", df_schema)
                else:
                    pm = self.manifest(parent)
                    base_shards = pm.get("file_shards", [])
                    base_tail = pm["files"]
                    schema = _evolve_schema(
                        pm.get("schema", df_schema), df_schema)
                shards, tail = self._shard_out(
                    base_shards, base_tail, added, token, attempt)
                attempt += 1
                sid = (parent or 0) + 1
                with open(tmp, "w") as fh:
                    json.dump({"snapshot_id": sid, "parent": parent,
                               "mode": mode, "files": tail,
                               "file_shards": shards, "schema": schema,
                               "added": added}, fh)
                try:
                    os.link(tmp, self._snap_file(sid))
                    return sid
                except FileExistsError:
                    # lost the race: rebase on the new current; this
                    # attempt's freshly-written shards are orphaned and
                    # age-swept by expire_snapshots
                    os.unlink(tmp)
                    continue
        finally:
            # tmp may not exist yet if the failure preceded its first
            # write (e.g. a corrupt parent manifest) — don't mask that
            import contextlib

            with contextlib.suppress(FileNotFoundError):
                os.unlink(tmp)

    def commit_rewrite(self, df: DataFrame, replaced: list[str],
                       require_parent: int) -> int:
        """Publish a snapshot whose live set = (parent's files −
        *replaced*) + *df*'s new files — the commit shape of a
        MERGE-INTO / copy-on-write rewrite. ALWAYS conditional: the
        rewritten rows were derived from *require_parent*'s state, so
        if the current snapshot moved the commit aborts (rebasing would
        silently drop the concurrent commit's rows — same argument as
        commit(require_parent=...)). The surviving file list re-shards
        from scratch (O(live files) manifest work — Iceberg avoids this
        with delete manifests; at this table's scale the re-shard is
        metadata-only and cheap, and the DATA cost is already only the
        candidate files)."""
        parent = self.current_snapshot_id()
        if parent != require_parent:
            raise RuntimeError(
                f"rewrite aborted: parent moved from {require_parent} "
                f"to {parent} (re-derive and retry)")
        pm = self.manifest(parent)
        survivors = [f for f in self._files(pm) if f not in set(replaced)]
        df_schema = json.loads(df.schema.json())
        token = uuid.uuid4().hex[:12]
        data_dir = f"data-{token}"
        df.write.parquet(os.path.join(self.path, data_dir))
        added = sorted(
            f"{data_dir}/{f}"
            for f in os.listdir(os.path.join(self.path, data_dir))
            if f.startswith("part-") and f.endswith(".parquet"))
        schema = _evolve_schema(pm.get("schema", df_schema), df_schema)
        shards, tail = self._shard_out([], survivors, added, token, 0)
        sid = parent + 1
        tmp = os.path.join(self._snap_dir(), f".tmp-{token}.json")
        with open(tmp, "w") as fh:
            json.dump({"snapshot_id": sid, "parent": parent,
                       "mode": "rewrite", "files": tail,
                       "file_shards": shards, "schema": schema,
                       "added": added, "replaced": sorted(replaced)}, fh)
        try:
            os.link(tmp, self._snap_file(sid))
        except FileExistsError:
            raise RuntimeError(
                f"rewrite aborted: lost the publish race for snapshot "
                f"{sid} (re-derive and retry)") from None
        finally:
            import contextlib

            with contextlib.suppress(FileNotFoundError):
                os.unlink(tmp)
        return sid

    def _file_key_range(self, rel: str, key_col: str
                        ) -> tuple | None:
        """(min, max) of *key_col* across a data file's row groups,
        from the parquet FOOTER statistics only — the same per-file
        pruning metadata an Iceberg manifest stores inline. None when
        stats are absent (the file then always qualifies as a merge
        candidate — conservative)."""
        import pyarrow.parquet as pq

        md = pq.read_metadata(os.path.join(self.path, rel))
        try:
            idx = md.schema.names.index(key_col)
        except ValueError:
            return None
        lo = hi = None
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            if st is None or not st.has_min_max:
                return None
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        return None if lo is None else (lo, hi)

    def merge_upsert(self, spark: SparkSession, source: DataFrame,
                     key_col: str, resolve) -> int:
        """MERGE INTO, copy-on-write at FILE granularity: upsert
        *source* into the table keyed on *key_col*. Only live data
        files whose footer [min, max] range of the key overlaps the
        source's key range are read and rewritten (range pruning — the
        conservative file-skipping every lake engine does from manifest
        stats); every other file survives by name. ``resolve(candidates,
        source)`` produces the merged rows for the candidate set — it
        must pass through candidate rows whose key is absent from
        *source* (e.g. ``union ∪ groupBy(key)`` for a CRDT register).
        The publish is conditional on the snapshot the merge read."""
        sid = self.current_snapshot_id()
        if sid is None:
            empty = source.filter(F.lit(False))
            return self.commit(resolve(empty, source), "append")
        bounds = source.agg(F.min(key_col), F.max(key_col)).collect()[0]
        lo, hi = bounds[0], bounds[1]
        m = self.manifest(sid)
        live = self._files(m)
        if lo is None:  # empty source: nothing to merge
            return sid
        cand = []
        for f in live:
            rng = self._file_key_range(f, key_col)
            if rng is None or not (rng[1] < lo or rng[0] > hi):
                cand.append(f)
        if not cand:
            # pure insert: no live file can contain a matching key
            return self.commit(
                resolve(source.filter(F.lit(False)), source),
                "append", require_parent=sid)
        candidates = self._read_files(spark, cand, m.get("schema"))
        merged = resolve(candidates, source)
        # materialize BEFORE the rewrite publishes (merged's lineage
        # reads the files the new snapshot drops)
        merged = merged.localCheckpoint()
        return self.commit_rewrite(merged, cand, require_parent=sid)

    # -- read --------------------------------------------------------------
    def _require(self, sid: int | None) -> int:
        cur = self.current_snapshot_id()
        if cur is None:
            raise ValueError(f"snapshot table {self.path} has no snapshots")
        if sid is None:
            return cur
        if not os.path.exists(self._snap_file(sid)):
            raise ValueError(f"unknown snapshot {sid} in {self.path}")
        return sid

    def _read_files(self, spark: SparkSession, files: list[str],
                    schema: dict | None = None) -> DataFrame:
        """Plan a scan of *files*. With a manifest *schema* (stored at
        commit time, evolved union-by-name), the scan is declared with
        it — files written before a column existed read NULL for it,
        and planning needs ZERO parquet footer reads (mergeSchema would
        stat every file; at 10^9 files the schema must come from
        metadata, which is exactly Iceberg's design)."""
        reader = spark.read
        if schema is not None:
            from pyspark.sql.types import StructType

            reader = reader.schema(StructType.fromJson(schema))
        return reader.parquet(*[os.path.join(self.path, f)
                                for f in files])

    def read(self, spark: SparkSession,
             snapshot_id: int | None = None) -> DataFrame:
        """The table as of *snapshot_id* (default: current) — time
        travel is just planning from an older manifest, INCLUDING its
        schema: a snapshot from before a column was added reads without
        that column."""
        sid = self._require(snapshot_id)
        m = self.manifest(sid)
        return self._read_files(spark, self._files(m), m.get("schema"))

    def read_appended(self, spark: SparkSession, since: int,
                      until: int | None = None) -> DataFrame:
        """Only the rows ADDED by snapshots in ``(since, until]`` — the
        incremental/CDC scan: planning unions the ``added`` lists, so
        the cost is proportional to the delta, never the table."""
        until = self._require(until)
        # rewrite (compaction) snapshots add FILES but no ROWS — a CDC
        # scan that counted their files would replay the whole table as
        # "new"; skip them, exactly like Iceberg's incremental scan
        # skips REPLACE snapshots
        files = [f for sid in self.history() if since < sid <= until
                 and self.manifest(sid).get("mode") != "compact"
                 for f in self.manifest(sid)["added"]]
        if not files:
            raise ValueError(
                f"no files added in ({since}, {until}] of {self.path}")
        # the window's newest manifest has the widest schema any file in
        # the window was written with
        return self._read_files(
            spark, files, self.manifest(until).get("schema"))

    def diff(self, old: int, new: int) -> dict[str, list[str]]:
        """Data files added/removed between two snapshots (metadata-only;
        no data is read)."""
        a = set(self._files(self.manifest(self._require(old))))
        b = set(self._files(self.manifest(self._require(new))))
        return {"added": sorted(b - a), "removed": sorted(a - b)}

    def compact(self, spark: SparkSession, target_files: int = 4) -> int:
        """Small-file compaction: rewrite the CURRENT live file set into
        ``target_files`` files and publish the result as a ``compact``
        snapshot — same rows, fewer files (the 100 TB maintenance job:
        streaming appends leave thousands of small files per partition,
        and a parquet row group is the unit of scan parallelism, so
        read amplification compounds until a rewrite).

        Semantics, matching Iceberg's REPLACE operations:
        - time travel to pre-compaction snapshots still plans from their
          manifests over the immutable old files (nothing is deleted);
        - the incremental scan (:meth:`read_appended`) SKIPS compact
          snapshots — they add files but no rows, and a CDC consumer
          must not replay the table;
        - concurrent commits win: the publish is CONDITIONAL on the
          snapshot the rewrite was derived from still being current
          (``require_parent``) — a rebase would silently drop a
          concurrent append's rows, so compaction ABORTS instead and the
          caller re-runs it (rewriting is idempotent)."""
        base = self._require(None)
        df = self.read(spark, base).repartition(target_files)
        return self.commit(df, mode="compact", require_parent=base)

    # -- maintenance ---------------------------------------------------------
    def expire_snapshots(self, keep_last: int = 1,
                         orphan_grace_sec: float = 86400.0) -> dict:
        """Retention GC (Iceberg ``expireSnapshots`` + ``removeOrphanFiles``
        in one pass): drop all but the newest *keep_last* manifests, then
        delete every data file no retained manifest references. That
        sweep also collects ORPHANS — data files a failed commit wrote
        whose manifest never published (invisible to readers, but they
        leak disk forever otherwise). Files referenced by no manifest at
        all are only deleted once older than *orphan_grace_sec*: an
        in-flight concurrent commit has written its ``data-<token>/``
        but not yet linked its manifest, and must survive until publish
        (Iceberg's remove_orphan_files has the same age guard).

        Time travel within retention keeps working — every retained
        manifest's full file list survives. Expired snapshot ids raise
        on read, as after Iceberg expiry. Returns
        ``{"expired_snapshots": [...], "deleted_files": [...]}``."""
        import time

        if keep_last < 1:
            raise ValueError("keep_last must be >= 1 (the current "
                             "snapshot is never expirable)")
        ids = self.history()
        retained, expired = ids[-keep_last:], ids[:-keep_last]
        referenced = {f for sid in retained
                      for f in self._files(self.manifest(sid))}
        ever_manifested = {f for sid in ids
                           for f in self._files(self.manifest(sid))}
        # shard files referenced by any RETAINED manifest must survive;
        # shards are shared across snapshots (a child reuses its parent's
        # full shards by name), so deletion is by reference against the
        # retained set, never per-owning-snapshot
        retained_shards = {s for sid in retained
                           for s in self.manifest(sid).get("file_shards", [])}
        now = time.time()
        deleted: list[str] = []
        for entry in sorted(os.listdir(self.path)):
            d = os.path.join(self.path, entry)
            if not (entry.startswith("data-") and os.path.isdir(d)):
                continue
            parts = sorted(os.listdir(d))
            data_parts = [p for p in parts
                          if p.startswith("part-") and p.endswith(".parquet")]
            kept = False
            for part in data_parts:
                rel = f"{entry}/{part}"
                p = os.path.join(d, part)
                if rel in referenced:
                    kept = True
                    continue
                if rel not in ever_manifested:
                    # never published: a failed/in-flight commit's file —
                    # age-gate it so a concurrent committer's data
                    # survives until its manifest links
                    try:
                        if now - os.path.getmtime(p) < orphan_grace_sec:
                            kept = True
                            continue
                    except OSError:
                        continue  # vanished under us (concurrent GC)
                # referenced only by expired manifests, or an aged orphan
                try:
                    os.unlink(p)
                    deleted.append(rel)
                except OSError:
                    pass
            if kept:
                continue
            # no live data remains: sweep write markers (_SUCCESS, .crc)
            # and the directory itself; a dir with no data files yet
            # (a commit mid-write) is only swept once aged
            try:
                if not data_parts and \
                        now - os.path.getmtime(d) < orphan_grace_sec:
                    continue
            except OSError:
                continue
            for part in parts:
                if part in data_parts:
                    continue
                import contextlib

                with contextlib.suppress(OSError):
                    os.unlink(os.path.join(d, part))
            try:
                os.rmdir(d)  # only succeeds once empty
            except OSError:
                pass
        expired_shards = {
            s for sid in expired
            for s in self.manifest(sid).get("file_shards", [])
        } - retained_shards
        for sid in expired:
            try:
                os.unlink(self._snap_file(sid))
            except OSError:
                pass
        # shard files: expired manifests' shards go now (their owners are
        # gone and no retained manifest shares them); any OTHER
        # unreferenced shard is a lost-race/in-flight commit's write and
        # is only swept once aged, like data-file orphans
        for f in os.listdir(self._snap_dir()):
            if not (f.startswith("shard-") and f.endswith(".json")):
                continue
            if f in retained_shards:
                continue
            p = os.path.join(self._snap_dir(), f)
            try:
                if f in expired_shards or \
                        now - os.path.getmtime(p) >= orphan_grace_sec:
                    os.unlink(p)
            except OSError:
                pass
        # stale staged manifests a crashed committer left behind
        for f in os.listdir(self._snap_dir()):
            if f.startswith(".tmp-") and f.endswith(".json"):
                p = os.path.join(self._snap_dir(), f)
                try:
                    if now - os.path.getmtime(p) >= orphan_grace_sec:
                        os.unlink(p)
                except OSError:
                    pass
        return {"expired_snapshots": expired, "deleted_files": deleted}
