"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() on DuckDB
at sf0.01, compare row count, column names, and an order-insensitive
value hash. Usage: python tools/check_correctness.py [sf_dir] [names...]
"""

from __future__ import annotations

import datetime
import hashlib
import math
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.9g}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat().replace("T", " ")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (int,)):
        return str(v)
    return str(v)


def value_hash(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from hindex_spark.session import get_spark

    spark = get_spark("correctness_check")
    con = duckdb.connect()
    # Cap the oracle's memory: some oracle SQL is deliberately naive
    # (unvalved all-pairs LSH banding) and quadratic in corpus size —
    # fine at the driver's sf0.01, but at sf1 an uncapped DuckDB grew
    # past 100 GB and the OOM killer took the whole gate run down.
    # Capped, an infeasible oracle fails loudly as ONE query's error.
    try:
        con.execute("SET memory_limit='24GB'")
        # ...and its disk spill: the same quadratic oracle, allowed to
        # spill unboundedly, filled the whole disk at sf1 (76 GB of
        # duckdb_temp_storage-*.tmp) and took down every other job on
        # the machine. Capped, it fails fast as that one query's error.
        con.execute("SET max_temp_directory_size='30GB'")
    except Exception:
        pass
    for t in TABLES:
        # driver testdata is one file per table; tools/make_sf1.py (and
        # any Spark writer) produces a DIRECTORY of part files — glob it
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    ran = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        ran += 1
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        # Decimal FINAL columns are a cross-engine hash hazard: this
        # checker compares str(Decimal) == str(Decimal) (both sides
        # fetchall), but comparators that widen one side to float64
        # (e.g. DuckDB .df()) see '12.500000' vs '12.5' — the root
        # cause of the three-round rollup driver-red. HARD FAIL (was a
        # WARN — which fired on profile_correlations and got shipped
        # anyway): this class is structurally unshippable, even when
        # the values happen to match locally.
        deci = [c for c, t in sdf.dtypes if t.startswith("decimal")]
        if deci:
            failures.append(name)
            print(f"FAIL {name}: DECIMAL final column(s) {deci} — "
                  "cross-engine hash risk; project integers or doubles")
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only check, {len(srows)} rows (no oracle)")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = list(rel.columns)
            otypes = [str(t) for t in rel.types]
            orows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        # same hard gate on the ORACLE side: a decimal-final oracle
        # column hashes differently in any comparator that widens it
        odeci = [c for c, t in zip(ocols, otypes) if t.startswith("DECIMAL")]
        if odeci:
            failures.append(name)
            print(f"FAIL {name}: DECIMAL oracle column(s) {odeci} — "
                  "cross-engine hash risk; project integers or doubles")
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not problems:
            sh = value_hash(scols, srows)
            oh = value_hash(ocols, orows)
            if sh != oh:
                problems.append("value hash mismatch")
                so = sorted(
                    "|".join(
                        _norm(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i])
                    )
                    for r in srows
                )
                oo = sorted(
                    "|".join(
                        _norm(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i])
                    )
                    for r in orows
                )
                for a, b in zip(so, oo):
                    if a != b:
                        problems.append(f"  first diff:\n    spark : {a}\n    oracle: {b}")
                        break
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems[:3]))
        else:
            print(f"PASS {name} ({len(srows)} rows)")
    print(f"\n{ran - len(failures)}/{ran} pass" + (f"; failing: {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
