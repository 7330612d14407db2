"""Deterministic file fixtures for the bulk-ingest sources (FIXTURES.md §4-5):
the tax CSV/ZIP, overlapping merge datasets, temple XML, and JSONL.gz bulk
import. Pure functions of (seed, n) — byte-identical per seed."""

from __future__ import annotations

import gzip
import io
import json
import os
import zipfile

import numpy as np

# the 16-column header contract of TaxCrawler.php:110-127
TAX_HEADERS = [
    "營業地址", "統一編號", "總機構統一編號", "營業人名稱", "資本額", "設立日期",
    "組織別名稱", "使用統一發票", "行業代號", "名稱", "行業代號1", "名稱1",
    "行業代號2", "名稱2", "行業代號3", "名稱3",
]


def tax_csv_bytes(seed: int = 42, n: int = 200) -> bytes:
    """CSV with comment lines (備註:/檔案產生日期：), full-width spaces inside
    cells, ROC dates (1090315), and some invalid non-8-digit IDs that must be
    skipped (TaxCrawler.php:98-142)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    lines = [
        "備註:本檔案由財政部提供",
        "檔案產生日期：1140316",
        ",".join(TAX_HEADERS),
    ]
    for i in range(n):
        bad = i % 17 == 0
        tax_id = f"{rng.integers(10**7, 10**8):08d}" if not bad else f"{i:05d}"
        roc = f"{int(rng.integers(60, 114)):03d}{int(rng.integers(1, 13)):02d}{int(rng.integers(1, 29)):02d}"
        codes = []
        for j in range(4):
            if j == 0 or rng.random() < 0.5:
                codes += [f"{rng.integers(100000, 999999):06d}", f"行業{int(rng.integers(0, 100)):02d}"]
            else:
                codes += ["", ""]
        row = [
            f"台北市　中正區測試路{i}號",  # full-width space to strip (X14)
            tax_id,
            "",
            f"測試商行{i:04d}",
            str(int(rng.integers(10**5, 10**8))),
            roc,
            "獨資",
            "Y" if rng.random() < 0.5 else "N",
            *codes,
        ]
        lines.append(",".join(row))
    return ("\n".join(lines) + "\n").encode("utf-8")


def tax_zip_bytes(seed: int = 42, n: int = 200, inner_name: str = "tax.csv") -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        zi = zipfile.ZipInfo(inner_name, date_time=(2020, 1, 1, 0, 0, 0))
        z.writestr(zi, tax_csv_bytes(seed, n))
    return buf.getvalue()


def temple_xml_bytes(seed: int = 42, n: int = 50) -> bytes:
    """Temple XML (crawl-temple.php:84-116): OpenData_3 elements with 14
    fields incl. WGS84 coordinates-as-strings."""
    rng = np.random.Generator(np.random.PCG64(seed ^ 0x7E3F))
    items = []
    for i in range(n):
        items.append(
            f"<OpenData_3>"
            f"<寺廟名稱>測試宮{i:03d}</寺廟名稱>"
            f"<主祀神祇>神祇{int(rng.integers(0, 10))}</主祀神祇>"
            f"<行政區>區{int(rng.integers(0, 5))}</行政區>"
            f"<地址>測試路{i}號</地址>"
            f"<教別>道教</教別>"
            f"<登記別>募建</登記別>"
            f"<電話>02-0000{i:04d}</電話>"
            f"<負責人>負責人{i:03d}</負責人>"
            f"<其他>N/A</其他>"
            f"<WGS84X>{121.0 + float(rng.random()):.6f}</WGS84X>"
            f"<WGS84Y>{25.0 + float(rng.random()):.6f}</WGS84Y>"
            f"<統一編號>{int(rng.integers(10**7, 10**8)):08d}</統一編號>"
            f"<核准設立日期>0{int(rng.integers(60, 99)):02d}0101</核准設立日期>"
            f"<備註></備註>"
            f"</OpenData_3>"
        )
    return ("<?xml version='1.0' encoding='UTF-8'?><root>" + "".join(items) + "</root>").encode(
        "utf-8"
    )


def jsonl_gz_bytes(seed: int = 42, n: int = 100) -> bytes:
    """JSONL.gz bulk-import fixture (extract-records.php:13-90): one entity
    JSON per line, IDs needing zero-pad normalization."""
    rng = np.random.Generator(np.random.PCG64(seed ^ 0x15EC))
    lines = []
    for i in range(n):
        raw_id = int(rng.integers(1, 10**8))
        lines.append(
            json.dumps(
                {"統一編號": str(raw_id), "名稱": f"批次公司{i:04d}",
                 "資本額": int(rng.integers(10**4, 10**9))},
                ensure_ascii=False,
            )
        )
    return gzip.compress(("\n".join(lines) + "\n").encode("utf-8"), mtime=0)


def overlap_csv_bytes(seed: int, which: int, n: int = 60) -> bytes:
    """Two overlapping datasets sharing keys with conflicting fields — the
    merge-overlay fixture (new value wins even when empty —
    crawl-others.php:186-204). BOM-prefixed like data.gov.tw CSVs (S8)."""
    rng = np.random.Generator(np.random.PCG64(seed ^ which))
    header = "統一編號,名稱,地址,電話"
    rows = [header]
    for i in range(n):
        key = f"{(i % 40) + 10**7:08d}"  # keys overlap across the two files
        name = f"資料集{which}公司{i:03d}"
        addr = "" if (which == 2 and i % 5 == 0) else f"路{i}號"
        tel = f"0{which}-{int(rng.integers(10**6, 10**7))}"
        rows.append(f"{key},{name},{addr},{tel}")
    return b"\xef\xbb\xbf" + ("\n".join(rows) + "\n").encode("utf-8")


def write_all(dest_dir: str, seed: int = 42) -> dict[str, str]:
    os.makedirs(dest_dir, exist_ok=True)
    paths = {}
    for name, data in [
        ("tax.csv", tax_csv_bytes(seed)),
        ("tax.zip", tax_zip_bytes(seed)),
        ("temple.xml", temple_xml_bytes(seed)),
        ("records.jsonl.gz", jsonl_gz_bytes(seed)),
        ("dataset1.csv", overlap_csv_bytes(seed, 1)),
        ("dataset2.csv", overlap_csv_bytes(seed, 2)),
    ]:
        p = os.path.join(dest_dir, name)
        with open(p, "wb") as f:
            f.write(data)
        paths[name] = p
    return paths
