"""Dataset fingerprint: per-table row count + order-insensitive content
hash (xor of DuckDB whole-row hashes), so BENCH_sf* artifacts can pin
WHICH data they measured — a regenerated corpus then diffs as a
fingerprint change instead of masquerading as a code regression.

Usage:
    python tools/fingerprint_data.py [data_dir] [out.json]

Defaults: ./benchdata/sf1 -> stdout. The hash is row-order- and
file-layout-insensitive (xor is commutative), so a re-write of
identical content with different partitioning fingerprints identically.
"""

from __future__ import annotations

import json
import os
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def fingerprint(data_dir: str) -> dict:
    con = duckdb.connect()
    out = {}
    for t in TABLES:
        p = f"{data_dir}/{t}.parquet"
        if not os.path.exists(p):
            continue
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        n, h = con.sql(
            f"SELECT count(*), to_hex(bit_xor(hash(t))) "
            f"FROM (SELECT * FROM read_parquet('{src}')) t"
        ).fetchall()[0]
        out[t] = {"rows": int(n), "content_hash": h}
    return out


def main():
    data_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchdata", "sf1",
    )
    fp = {"data_dir": data_dir, "tables": fingerprint(data_dir)}
    text = json.dumps(fp, indent=2)
    if len(sys.argv) > 2:
        with open(sys.argv[2], "w") as f:
            f.write(text + "\n")
    print(text)


if __name__ == "__main__":
    main()
