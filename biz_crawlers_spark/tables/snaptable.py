"""SnapTable — an Iceberg-shaped snapshot/manifest table layer over Parquet.

The sandbox ships no Iceberg/Delta jars, so the engine's "Iceberg tables"
(north_rule) are provided by this from-scratch layer with the same semantic
surface: atomic snapshot commits, MERGE, snapshot history + time travel,
rollback, and per-snapshot summary metrics. The API is deliberately
Iceberg-shaped so a real catalog can be slotted in on a production cluster.

It replaces the reference's durability story — one JSON file per entity
rewritten in place (DetailCrawler.php:888-949), a JSON tracking file rewritten
at end of crawl (GCISCrawler.php:502-511), and periodic `git commit` as the
checkpoint (crawl-details.php:245-291) — with proper table semantics.

Scale design (what makes MERGE viable at 10^10 rows):

- Data files are **hash-bucketed by key**: each commit writes files under
  ``data/s{snapshot}/_bucket=K/``, with K = pmod(xxhash64(key), n_buckets)
  recorded per file in the manifest.
- MERGE is **bucket-pruned copy-on-write**: only buckets that actually
  contain update keys are rewritten; all other data files are carried over
  into the new snapshot untouched. An update batch touching B of N buckets
  rewrites B/N of the table, not all of it.
- The bucket id is derivable from the key (xxhash64), so it is never stored
  as a data column — no storage overhead, and both sides of the MERGE join
  are already co-partitioned by construction (repartition on the same
  bucket expression), which keeps the join shuffle minimal.

Layout:
    {path}/manifests/snap-{id:012d}.json   one manifest per snapshot
    {path}/data/s{id}/_bucket=K/*.parquet  immutable data files
    {path}/_current                        atomic pointer (os.replace)

Single-writer (the driver epoch loop) is assumed, matching the reference's
single-process model; a production deployment would swap the pointer file
for a catalog with atomic compare-and-swap.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        meta = self._read_meta()
        self.key_cols: list[str] = meta["key_cols"]
        self.n_buckets: int = meta["n_buckets"]
        self.schema_ddl: str = meta["schema_ddl"]
        # generated columns: name → SQL expr recomputed on EVERY write path
        # (append/overwrite/merge — including merges that did not supply the
        # column), so the stored value can never go stale no matter which
        # caller mutated the table
        self.derived: dict[str, str] = meta.get("derived", {})
        # columns whose per-file min/max land in the manifest (the Iceberg
        # manifest-stats trick) — read_stats_pruned() uses them to skip data
        # files, or the whole scan, without touching row data
        self.stat_cols: list[str] = meta.get("stat_cols", [])

    # ---------- creation / metadata ----------

    @staticmethod
    def create(
        spark: SparkSession,
        path: str,
        schema_ddl: str,
        key_cols: list[str],
        n_buckets: int = 16,
        derived: dict[str, str] | None = None,
        stat_cols: list[str] | None = None,
    ) -> "SnapTable":
        path = path.rstrip("/")
        os.makedirs(os.path.join(path, "manifests"), exist_ok=True)
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        meta = {"schema_ddl": schema_ddl, "key_cols": key_cols, "n_buckets": n_buckets}
        if derived:
            meta["derived"] = derived
        if stat_cols:
            meta["stat_cols"] = stat_cols
        SnapTable._atomic_write(os.path.join(path, "_meta.json"), json.dumps(meta))
        SnapTable._atomic_write(os.path.join(path, "_current"), "-1")
        return SnapTable(spark, path)

    @staticmethod
    def exists(path: str) -> bool:
        return os.path.exists(os.path.join(path, "_meta.json"))

    @staticmethod
    def _atomic_write(dest: str, content: str) -> None:
        tmp = f"{dest}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(content)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, dest)

    def _read_meta(self) -> dict:
        with open(os.path.join(self.path, "_meta.json")) as f:
            return json.load(f)

    def ensure_meta(
        self,
        schema_ddl: str,
        derived: dict[str, str] | None = None,
        stat_cols: list[str] | None = None,
    ) -> bool:
        """Open-time metadata migration for tables created by an OLDER
        engine version (ADVICE r3: a records table from a pre-``corrupt``
        workdir reopened with ttl_epochs set would raise on the stats probe,
        or worse, silently skip the corruption branch).

        New columns may only be ADDED (append-compatible evolution — the
        Iceberg add-column rule): existing data files simply lack the column
        and read as NULL under the new explicit schema. Derived columns are
        healed lazily: reads recompute them on the fly when stored NULL
        (see read()/read_stats_pruned()), and the next physical rewrite of a
        file stores the computed value. Returns True when a migration was
        written. Raises if the stored schema is not a prefix of the new one
        (a true incompatibility should fail loudly, not corrupt silently).
        """
        derived = derived or {}
        stat_cols = stat_cols or []
        if (
            schema_ddl == self.schema_ddl
            and derived == self.derived
            and stat_cols == self.stat_cols
        ):
            return False
        old_fields = [c.strip() for c in self.schema_ddl.split(",")]
        new_fields = [c.strip() for c in schema_ddl.split(",")]
        if new_fields[: len(old_fields)] != old_fields:
            raise ValueError(
                f"incompatible schema evolution for {self.path}: stored "
                f"{self.schema_ddl!r} is not a prefix of {schema_ddl!r}"
            )
        meta = self._read_meta()
        meta["schema_ddl"] = schema_ddl
        meta["derived"] = derived
        meta["stat_cols"] = stat_cols
        for k in ("derived", "stat_cols"):
            if not meta[k]:
                del meta[k]
        self._atomic_write(os.path.join(self.path, "_meta.json"), json.dumps(meta))
        self.schema_ddl = schema_ddl
        self.derived = derived
        self.stat_cols = stat_cols
        return True

    def _heal_derived(self, df: DataFrame) -> DataFrame:
        """Recompute derived columns on the fly where the stored value is
        NULL — the read-side half of ensure_meta's lazy healing (legacy data
        files predate the column; new writes always store it)."""
        for name, expr in self.derived.items():
            df = df.withColumn(name, F.coalesce(F.col(name), F.expr(expr)))
        return df

    # ---------- snapshots ----------

    def current_snapshot_id(self) -> int:
        with open(os.path.join(self.path, "_current")) as f:
            return int(f.read().strip())

    def _manifest_path(self, snapshot_id: int) -> str:
        return os.path.join(self.path, "manifests", f"snap-{snapshot_id:012d}.json")

    def _load_manifest(self, snapshot_id: int) -> dict:
        with open(self._manifest_path(snapshot_id)) as f:
            return json.load(f)

    def snapshots(self) -> list[dict]:
        """Snapshot history, oldest first (metadata only, no file lists)."""
        out = []
        sid = self.current_snapshot_id()
        while sid >= 0:
            m = self._load_manifest(sid)
            out.append({k: m[k] for k in ("snapshot_id", "parent_id", "ts", "operation", "summary")})
            sid = m["parent_id"]
        return list(reversed(out))

    # ---------- key bucketing ----------

    def _bucket_expr(self):
        key = (
            F.col(self.key_cols[0])
            if len(self.key_cols) == 1
            else F.concat_ws("\x1f", *[F.col(c).cast("string") for c in self.key_cols])
        )
        return F.pmod(F.xxhash64(key), F.lit(self.n_buckets)).cast("int")

    # ---------- read ----------

    def read(self, snapshot_id: int | None = None) -> DataFrame:
        sid = self.current_snapshot_id() if snapshot_id is None else snapshot_id
        if sid < 0:
            return self.spark.createDataFrame([], self.schema_ddl)
        files = [f["path"] for f in self._load_manifest(sid)["files"]]
        if not files:
            return self.spark.createDataFrame([], self.schema_ddl)
        return self._heal_derived(
            self.spark.read.schema(self.schema_ddl).parquet(
                *[os.path.join(self.path, p) for p in files]
            )
        )

    def is_empty(self) -> bool:
        sid = self.current_snapshot_id()
        return sid < 0 or not self._load_manifest(sid)["files"]

    def read_stats_pruned(self, col: str, value: bool = True) -> DataFrame | None:
        """Manifest-stats file pruning for a boolean ``stat_cols`` column:
        read only the data files whose footer stats say they MAY contain
        ``value``; return None when every file provably contains none (the
        common case costs zero scans — the manifest alone answers). Files
        without recorded stats are conservatively included."""
        sid = self.current_snapshot_id()
        if sid < 0:
            return None
        cand = []
        for f in self._load_manifest(sid)["files"]:
            st = (f.get("stats") or {}).get(col)
            may = st is None or (st[1] is True if value else st[0] is False)
            if may:
                cand.append(f["path"])
        if not cand:
            return None
        return self._heal_derived(
            self.spark.read.schema(self.schema_ddl).parquet(
                *[os.path.join(self.path, p) for p in cand]
            )
        )

    # ---------- write paths ----------

    def _write_data_files(
        self,
        df: DataFrame,
        snapshot_id: int,
        bucketize: bool = True,
        salt_n: int | None = None,
    ) -> list[dict]:
        """Write df bucketed by key; return manifest file entries.
        ``bucketize=False`` skips the bucket shuffle (for append-only tables
        that are never MERGEd — lineage, order logs); such files get bucket
        -1, which every MERGE treats as always-touched."""
        for name, expr in self.derived.items():
            df = df.withColumn(name, F.expr(expr))
        dest = os.path.join(self.path, "data", f"s{snapshot_id}")
        if bucketize:
            # write parallelism must not be capped at n_buckets: an
            # INDEPENDENT salt (different hash seed than the bucket expr —
            # same-modulus salts would be fully determined by the bucket)
            # spreads each bucket over several writer tasks; partitionBy
            # still lands every row in its bucket directory, just as
            # multiple files (the manifest tracks files per bucket already)
            par = self.spark.sparkContext.defaultParallelism
            if salt_n is None:
                salt_n = max(1, (par * 2) // self.n_buckets)
            salt = F.pmod(
                F.xxhash64(F.col(self.key_cols[0]).cast("string"), F.lit("_w")),
                F.lit(salt_n),
            )
            (
                df.withColumn("_bucket", self._bucket_expr())
                .repartition(max(par, self.n_buckets), F.col("_bucket"), salt)
                .write.partitionBy("_bucket")
                .mode("overwrite")
                .parquet(dest)
            )
        else:
            df.write.mode("overwrite").parquet(dest)
        entries = []
        for bdir in sorted(os.listdir(dest)):
            if bdir.startswith("_bucket="):
                bucket = int(bdir.split("=", 1)[1])
                for fn in sorted(os.listdir(os.path.join(dest, bdir))):
                    if fn.endswith(".parquet"):
                        rel = os.path.join("data", f"s{snapshot_id}", bdir, fn)
                        entries.append({"path": rel, "bucket": bucket})
            elif bdir.endswith(".parquet"):
                rel = os.path.join("data", f"s{snapshot_id}", bdir)
                entries.append({"path": rel, "bucket": -1})
        if self.stat_cols:
            for e in entries:
                e["stats"] = self._file_stats(os.path.join(self.path, e["path"]))
        return entries

    def _file_stats(self, abs_path: str) -> dict:
        """Per-file min/max for ``stat_cols`` from the parquet footer —
        driver-side metadata reads at commit time, O(files), never row data."""
        import pyarrow.parquet as pq

        out: dict = {}
        md = pq.ParquetFile(abs_path).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for col in self.stat_cols:
            i = idx.get(col)
            if i is None:
                continue
            mn = mx = None
            ok = True
            for rg in range(md.num_row_groups):
                s = md.row_group(rg).column(i).statistics
                if s is None or not s.has_min_max:
                    ok = False
                    break
                mn = s.min if mn is None else min(mn, s.min)
                mx = s.max if mx is None else max(mx, s.max)
            if ok and mn is not None:
                out[col] = [mn, mx]
        return out

    def _commit(
        self, operation: str, files: list[dict], summary: dict | None
    ) -> int:
        parent = self.current_snapshot_id()
        sid = parent + 1
        manifest = {
            "snapshot_id": sid,
            "parent_id": parent,
            "ts": time.time(),
            "operation": operation,
            "schema_ddl": self.schema_ddl,
            "summary": summary or {},
            "files": files,
        }
        self._atomic_write(self._manifest_path(sid), json.dumps(manifest))
        self._atomic_write(os.path.join(self.path, "_current"), str(sid))
        return sid

    def _fill_derived_placeholders(self, df: DataFrame) -> DataFrame:
        """Callers may omit generated columns entirely — they are recomputed
        at write time regardless, so placeholder NULLs keep the select valid."""
        if not self.derived:
            return df
        have = set(df.columns)
        ref = self.spark.createDataFrame([], self.schema_ddl)
        for f in ref.schema.fields:
            if f.name in self.derived and f.name not in have:
                df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
        return df

    def append(
        self, df: DataFrame, summary: dict | None = None, bucketize: bool = True
    ) -> int:
        parent = self.current_snapshot_id()
        prev_files = self._load_manifest(parent)["files"] if parent >= 0 else []
        sid = parent + 1
        df = self._fill_derived_placeholders(df)
        new_files = self._write_data_files(df.select(*self._cols()), sid, bucketize)
        return self._commit("append", prev_files + new_files, summary)

    def overwrite(
        self, df: DataFrame, summary: dict | None = None, salt_n: int | None = None
    ) -> int:
        sid = self.current_snapshot_id() + 1
        df = self._fill_derived_placeholders(df)
        new_files = self._write_data_files(df.select(*self._cols()), sid, salt_n=salt_n)
        return self._commit("overwrite", new_files, summary)

    def _cols(self) -> list[str]:
        return [f.name for f in self.spark.createDataFrame([], self.schema_ddl).schema.fields]

    # ---------- MERGE (bucket-pruned copy-on-write) ----------

    def merge(
        self,
        updates: DataFrame,
        summary: dict | None = None,
        delete: bool = False,
        prefer: str = "new",
        dedupe: bool = True,
        touched_hint: str | None = None,
    ) -> int:
        """Upsert ``updates`` by key (or delete their keys if ``delete``).

        Matched rows: field overlay, update wins per non-key column when its
        value is non-null (reference semantics: new value wins even when it
        is an empty string — crawl-others.php:186-204; an *absent* field is
        a NULL here and keeps the old value). ``updates`` may carry a subset
        of columns; missing ones are treated as absent (NULL).
        ``prefer="old"`` flips the overlay (insert-if-absent: existing rows
        keep their values; update values only fill old NULLs).
        Unmatched update rows: inserted. Untouched buckets: carried over.

        ``updates`` is defensively deduplicated on the key columns (duplicate
        keys in one update batch would otherwise fan out through the
        full-outer join and permanently violate the table's key invariant —
        e.g. the same image bytes extracted from two pages in one epoch);
        callers that pre-deduplicate pass ``dedupe=False`` to skip the
        shuffle. NOTE: with ``dedupe=False`` the caller MUST guarantee
        key-distinct updates on EVERY path — the insert-only fast path (and
        the ``touched_hint="all"`` path) writes the batch directly, so
        duplicate keys land as duplicate rows instead of fanning out through
        the join; "distinct by construction" has to hold for the data, not
        just the usual caller. The updates plan is PERSISTED for the
        duration of the merge: it is consumed twice (touched-bucket
        discovery, then the join+write), and re-evaluating a plan that scans
        the epoch's staging output twice measurably dominated the commit
        path.

        ``touched_hint="all"`` declares that every bucket is (statistically
        certainly) touched by this update batch — e.g. the batch carries
        ≥ 32·n_buckets uniformly-hashed keys. The merge then skips BOTH the
        touched-bucket discovery job and the updates persist (the plan is
        consumed exactly once by the join+write). Safe regardless of the
        data: a bucket declared touched that holds no update keys is merely
        rewritten unchanged.
        """
        parent = self.current_snapshot_id()
        prev_files = self._load_manifest(parent)["files"] if parent >= 0 else []
        if dedupe:
            updates = updates.dropDuplicates(self.key_cols)

        if not delete:
            ref = self.spark.createDataFrame([], self.schema_ddl)
            have = set(updates.columns)
            missing = [f for f in ref.schema.fields if f.name not in have]
            for f in missing:
                updates = updates.withColumn(f.name, F.lit(None).cast(f.dataType))
        updates = updates.select(*(self._cols() if not delete else self.key_cols))

        if not prev_files:
            if delete:
                return self._commit("delete", [], summary)
            # INSERT-ONLY fast path: merging into an empty table degenerates
            # to a plain bucketed write — no touched-bucket discovery job, no
            # full-outer join (which would shuffle the payload bytes a SECOND
            # time), no persist (the plan is consumed exactly once). This is
            # the first-epoch shape of every payload table (images/records)
            # and measurably dominated the epoch commit tail at 10^6 rows.
            sid = parent + 1
            new_files = self._write_data_files(updates, sid)
            return self._commit("merge", new_files, summary)
        from pyspark.storagelevel import StorageLevel

        assume_all = touched_hint == "all"
        if not assume_all:
            updates = updates.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            if assume_all:
                keep_files: list[dict] = []
                hit_files = prev_files
            else:
                upd = updates.withColumn("_bucket", self._bucket_expr())
                touched = sorted(
                    r["_bucket"] for r in upd.select("_bucket").distinct().collect()
                )
                touched_set = set(touched) | {-1}  # unbucketed files always touched
                keep_files = [f for f in prev_files if f["bucket"] not in touched_set]
                hit_files = [f for f in prev_files if f["bucket"] in touched_set]

            if hit_files:
                old = self.spark.read.schema(self.schema_ddl).parquet(
                    *[os.path.join(self.path, f["path"]) for f in hit_files]
                )
            else:
                old = self.spark.createDataFrame([], self.schema_ddl)

            if delete:
                merged = old.join(
                    updates.select(*self.key_cols), on=self.key_cols, how="left_anti"
                )
                op = "delete"
            else:
                non_key = [c for c in self._cols() if c not in self.key_cols]
                o = old.alias("o")
                u = updates.alias("u")
                first, second = ("u", "o") if prefer == "new" else ("o", "u")
                merged = o.join(u, on=self.key_cols, how="full_outer").select(
                    *[
                        F.coalesce(F.col(f"o.{k}"), F.col(f"u.{k}")).alias(k)
                        for k in self.key_cols
                    ],
                    *[
                        F.coalesce(F.col(f"{first}.{c}"), F.col(f"{second}.{c}")).alias(c)
                        for c in non_key
                    ],
                )
                op = "merge"

            sid = parent + 1
            new_files = self._write_data_files(merged, sid)
            return self._commit(op, keep_files + new_files, summary)
        finally:
            if not assume_all:
                updates.unpersist()

    # ---------- maintenance ----------

    def rollback(self, snapshot_id: int) -> None:
        """Point the table back at an earlier snapshot. ``-1`` = empty table
        (pre-first-commit state) — used by the engine's epoch-atomicity
        recovery when a crash interrupted the very first commit."""
        if snapshot_id >= 0 and not os.path.exists(self._manifest_path(snapshot_id)):
            raise ValueError(f"no snapshot {snapshot_id}")
        self._atomic_write(os.path.join(self.path, "_current"), str(max(snapshot_id, -1)))

    def compact(self, summary: dict | None = None) -> int:
        """Rewrite the current snapshot into one fresh file per non-empty
        bucket (salt_n=1 disables the write-parallelism salt — compaction's
        whole point is the minimal file count)."""
        return self.overwrite(
            self.read(), summary={**(summary or {}), "compaction": True}, salt_n=1
        )

    def expire_snapshots(self, keep_last: int = 2) -> dict:
        """Iceberg-shaped maintenance: drop manifests older than the last
        ``keep_last`` snapshots and delete data files no retained snapshot
        references. Time travel remains available within the retention
        window; storage stops growing without bound (at 10^10-row scale the
        copy-on-write history is the dominant storage cost).

        Safe by construction: the current pointer is never expired, files
        are unlinked only when unreferenced by EVERY retained manifest."""
        current = self.current_snapshot_id()
        if current < 0:
            return {"expired_snapshots": 0, "deleted_files": 0}
        retained_ids = []
        sid = current
        while sid >= 0 and len(retained_ids) < keep_last:
            retained_ids.append(sid)
            sid = self._load_manifest(sid)["parent_id"]
        referenced: set[str] = set()
        for rid in retained_ids:
            referenced.update(f["path"] for f in self._load_manifest(rid)["files"])
        expired = 0
        deleted = 0
        mdir = os.path.join(self.path, "manifests")
        for name in sorted(os.listdir(mdir)):
            if not name.startswith("snap-"):
                continue
            msid = int(name[5:].split(".")[0])
            if msid in retained_ids:
                continue
            m = self._load_manifest(msid)
            for f in m["files"]:
                p = os.path.join(self.path, f["path"])
                if f["path"] not in referenced and os.path.exists(p):
                    os.unlink(p)
                    deleted += 1
            os.unlink(os.path.join(mdir, name))
            expired += 1
        # oldest retained manifest becomes the history root
        if retained_ids:
            oldest = min(retained_ids)
            m = self._load_manifest(oldest)
            if m["parent_id"] >= 0:
                m["parent_id"] = -1
                self._atomic_write(self._manifest_path(oldest), json.dumps(m))
        return {"expired_snapshots": expired, "deleted_files": deleted}
