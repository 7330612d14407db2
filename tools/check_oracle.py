"""Local stand-in for the driver's correctness gate: run every queries()
entry at sf0.01 and compare against oracle_sql() via DuckDB — row count,
column names, and an order-insensitive value hash (columns sorted by name,
rows sorted, values stringified with float normalization).

Usage: python tools/check_oracle.py [sf_dir] [only_query_name ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem",
          "events", "documents", "embeddings"]


def _norm(v) -> str:
    import datetime

    import numpy as np

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, (np.floating,)):
        return _norm(float(v))
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (datetime.datetime,)):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (datetime.date,)):
        return v.isoformat()
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    return str(v)


def frame_hash(pdf) -> tuple[int, list[str], str]:
    cols = sorted(pdf.columns)
    rows = sorted(
        tuple(_norm(v) for v in row) for row in pdf[cols].itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode("utf-8"))
        h.update(b"\x1e")
    return len(rows), cols, h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entrymod
    from biz_crawlers_spark.session import get_spark

    spark = get_spark(cores=8, shuffle_partitions=8, app="check-oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        if name not in osql:
            print(f"rows  {name}: {len(spdf)} rows (rows-only) [{time.time()-t0:.1f}s]")
            if len(spdf) == 0 and name != "r11_anti_join":
                print(f"      WARNING: zero rows from {name}")
            continue
        try:
            opdf = con.sql(osql[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error {str(e)[:200]}")
            failures += 1
            continue
        sn, sc, sh = frame_hash(spdf)
        on, oc, oh = frame_hash(opdf)
        ok = (sn, sc, sh) == (on, oc, oh)
        if not ok:
            failures += 1
            print(f"FAIL  {name}: spark({sn} rows, {sc}, {sh}) vs oracle({on} rows, {oc}, {oh})")
            if sc == oc and sn == on:
                scols = sorted(spdf.columns)
                s_rows = sorted(tuple(_norm(v) for v in r) for r in spdf[scols].itertuples(index=False, name=None))
                o_rows = sorted(tuple(_norm(v) for v in r) for r in opdf[scols].itertuples(index=False, name=None))
                for a, b in zip(s_rows, o_rows):
                    if a != b:
                        print(f"      first diff:\n      spark : {a}\n      oracle: {b}")
                        break
        else:
            print(f"OK    {name}: {sn} rows hash={sh} [{time.time()-t0:.1f}s]")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
