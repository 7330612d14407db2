"""Cuckoo filter — the deletable URL-seen variant (north_rule fallback).

Why it exists: the reference's checkpoint-repair path *removes* entries from
the seen set when their payloads are missing (GCISCrawler.php:534-603, D6 in
SURVEY.md §2.3). A Bloom filter cannot delete; a cuckoo filter can
(Fan et al., "Cuckoo Filter: Practically Better Than Bloom", CoNEXT'14).

Design: 4-slot buckets of 16-bit fingerprints (0 = empty slot), partial-key
cuckoo hashing — alt bucket i2 = i1 XOR hash(fp), so either bucket is
computable from the other plus the fingerprint. Bucket count is a power of
two. Lookups are numpy-vectorized over whole batches; inserts/deletes are
per-key (they mutate state) but only run on the small repair/commit paths,
never in the per-URL hot loop.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

import numpy as np

from biz_crawlers_spark.filters.bloom import splitmix64

_FP_MIX = np.uint64(0x5BD1E995)


class CuckooFilter:
    def __init__(self, n_buckets: int = 1 << 16, bucket_size: int = 4, max_kicks: int = 500,
                 seed: int = 42, table: np.ndarray | None = None):
        if n_buckets & (n_buckets - 1):
            raise ValueError("n_buckets must be a power of two")
        self.n_buckets = n_buckets
        self.bucket_size = bucket_size
        self.max_kicks = max_kicks
        self.rng = np.random.Generator(np.random.PCG64(seed))
        self.table = (
            table
            if table is not None
            else np.zeros((n_buckets, bucket_size), dtype=np.uint16)
        )

    # ---------- hashing ----------

    def _fp_and_index(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        u = np.asarray(keys, dtype=np.int64).view(np.uint64)
        h = splitmix64(u)
        fp = (h & np.uint64(0xFFFF)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)  # 0 is the empty-slot marker
        i1 = (splitmix64(u ^ np.uint64(0xC0FFEE)) & np.uint64(self.n_buckets - 1)).astype(
            np.int64
        )
        return fp, i1

    def _alt(self, i: np.ndarray | int, fp: np.ndarray | int) -> np.ndarray | int:
        with np.errstate(over="ignore"):
            mix = splitmix64(np.asarray(fp, dtype=np.uint64) * _FP_MIX)
        return (np.asarray(i, dtype=np.uint64) ^ mix).astype(np.int64) & (self.n_buckets - 1)

    # ---------- ops ----------

    def contains(self, keys: np.ndarray) -> np.ndarray:
        fp, i1 = self._fp_and_index(keys)
        i2 = self._alt(i1, fp)
        t = self.table
        return ((t[i1] == fp[:, None]).any(axis=1)) | ((t[i2] == fp[:, None]).any(axis=1))

    def _insert_one(self, fp: int, i1: int) -> bool:
        for idx in (i1, int(self._alt(i1, fp))):
            row = self.table[idx]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = fp
                return True
        # evict loop
        idx = i1 if self.rng.integers(2) else int(self._alt(i1, fp))
        for _ in range(self.max_kicks):
            slot = int(self.rng.integers(self.bucket_size))
            fp, self.table[idx, slot] = int(self.table[idx, slot]), fp
            idx = int(self._alt(idx, fp))
            row = self.table[idx]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = fp
                return True
        return False  # table full

    def add(self, keys: np.ndarray) -> int:
        """Insert keys (idempotent-ish: skips keys already present).
        Returns number actually inserted; raises if the table is full."""
        keys = np.asarray(keys, dtype=np.int64)
        fps, i1s = self._fp_and_index(keys)
        n = 0
        present = self.contains(keys)
        for j in range(len(keys)):
            if present[j]:
                continue
            if not self._insert_one(int(fps[j]), int(i1s[j])):
                raise RuntimeError("cuckoo filter full — grow n_buckets")
            n += 1
        return n

    def delete(self, keys: np.ndarray) -> int:
        """Remove keys (one fingerprint copy each). Returns number removed."""
        keys = np.asarray(keys, dtype=np.int64)
        fps, i1s = self._fp_and_index(keys)
        n = 0
        for j in range(len(keys)):
            fp = fps[j]
            for idx in (int(i1s[j]), int(self._alt(int(i1s[j]), int(fp)))):
                slots = np.flatnonzero(self.table[idx] == fp)
                if len(slots):
                    self.table[idx, slots[0]] = 0
                    n += 1
                    break
        return n

    # ---------- persistence ----------

    def save(self, path: str) -> None:
        np.save(path, self.table)

    @staticmethod
    def load(path: str, **kw) -> "CuckooFilter":
        table = np.load(path)
        return CuckooFilter(n_buckets=table.shape[0], bucket_size=table.shape[1], table=table, **kw)


class CuckooShards:
    """Sharded, versioned, ON-DISK cuckoo filter — the deletable seen-set
    mirror at 10^10-key scale, built and mutated entirely inside executors.

    Same layout discipline as BloomShards (one npy table per
    ``pmod(url_key, n_shards)`` shard, versioned dirs, atomic pointer): a
    distributed add/delete shuffles keys to their shard once, each task
    rewrites exactly ONE shard file into version v+1, untouched shards are
    hardlinked, and the driver commits the pointer. No key set ever
    materializes on the driver — the round-1 ``seen.collect()`` mirror
    build (the one component that could not run at north_rule scale) is
    replaced by this path.
    """

    def __init__(self, path: str):
        self.path = path.rstrip("/")
        with open(os.path.join(self.path, "_meta.json")) as f:
            meta = json.load(f)
        self.n_shards: int = meta["n_shards"]
        self.n_buckets: int = meta["n_buckets"]
        self.bucket_size: int = meta["bucket_size"]

    @staticmethod
    def exists(path: str) -> bool:
        return os.path.exists(os.path.join(path.rstrip("/"), "_meta.json"))

    @staticmethod
    def create(
        path: str, n_shards: int = 16, n_buckets: int = 1 << 16, bucket_size: int = 4
    ) -> "CuckooShards":
        path = path.rstrip("/")
        os.makedirs(os.path.join(path, "v0"), exist_ok=True)
        empty = np.zeros((n_buckets, bucket_size), dtype=np.uint16)
        for s in range(n_shards):
            np.save(os.path.join(path, "v0", f"shard-{s}.npy"), empty)
        tmp = os.path.join(path, f"_meta.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(
                {"n_shards": n_shards, "n_buckets": n_buckets, "bucket_size": bucket_size}, f
            )
        os.replace(tmp, os.path.join(path, "_meta.json"))
        CuckooShards._write_pointer(path, 0)
        return CuckooShards(path)

    @staticmethod
    def _write_pointer(path: str, version: int) -> None:
        tmp = os.path.join(path, f"_current.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, os.path.join(path, "_current"))

    def current_version(self) -> int:
        with open(os.path.join(self.path, "_current")) as f:
            return int(f.read().strip())

    def _shard_file(self, version: int, s: int) -> str:
        return os.path.join(self.path, f"v{version}", f"shard-{s}.npy")

    def expire_versions(self, keep_last: int = 2) -> int:
        """Same retention policy as BloomShards.expire_versions."""
        cur = self.current_version()
        removed = 0
        for name in os.listdir(self.path):
            if not name.startswith("v"):
                continue
            try:
                v = int(name[1:])
            except ValueError:
                continue
            if v <= cur - keep_last:
                shutil.rmtree(os.path.join(self.path, name), ignore_errors=True)
                removed += 1
        return removed

    # ---------- local API (tests / small scale) ----------

    def contains(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.int64)
        out = np.zeros(len(keys), dtype=bool)
        ver = self.current_version()
        shards = keys % self.n_shards
        shards = np.where(shards < 0, shards + self.n_shards, shards)
        for s in np.unique(shards):
            mask = shards == s
            cf = CuckooFilter.load(self._shard_file(ver, int(s)))
            out[mask] = cf.contains(keys[mask])
        return out

    # ---------- Spark API (co-partitioned by shard) ----------

    def _apply_spark(self, df, key_col: str, op: str) -> int:
        """One shuffle on shard; each task loads its shard's table, applies
        add/delete with numpy+CuckooFilter, writes v+1; pointer committed by
        the driver (identical discipline to BloomShards.add_spark)."""
        import pandas as pd
        from pyspark.sql import functions as F

        path, n_shards = self.path, self.n_shards
        ver = self.current_version()
        new = ver + 1
        os.makedirs(os.path.join(path, f"v{new}"), exist_ok=True)

        def _update(pdf: pd.DataFrame) -> pd.DataFrame:
            keys = pdf[key_col].to_numpy(dtype=np.int64)
            s = int(keys[0] % n_shards)
            s = s + n_shards if s < 0 else s
            cf = CuckooFilter.load(os.path.join(path, f"v{ver}", f"shard-{s}.npy"))
            n = cf.add(keys) if op == "add" else cf.delete(keys)
            tmp = os.path.join(path, f"v{new}", f".tmp-{uuid.uuid4().hex}-shard-{s}.npy")
            np.save(tmp, cf.table)
            os.replace(tmp, os.path.join(path, f"v{new}", f"shard-{s}.npy"))
            return pd.DataFrame({"shard": [s], "n": [n]})

        shard_col = F.pmod(F.col(key_col), F.lit(n_shards))
        touched = (
            df.select(key_col)
            .dropDuplicates([key_col])
            .groupBy(shard_col.alias("_shard"))
            .applyInPandas(lambda key, pdf: _update(pdf), schema="shard int, n long")
            .collect()
        )
        touched_set = {r["shard"] for r in touched}
        for s in range(n_shards):
            if s not in touched_set:
                src, dst = self._shard_file(ver, s), self._shard_file(new, s)
                try:
                    os.link(src, dst)
                except OSError:
                    shutil.copyfile(src, dst)
        self._write_pointer(path, new)
        return int(sum(r["n"] for r in touched))

    def add_spark(self, df, key_col: str = "url_key") -> int:
        return self._apply_spark(df, key_col, "add")

    def delete_spark(self, df, key_col: str = "url_key") -> int:
        return self._apply_spark(df, key_col, "delete")
