"""Same-data A/B: does the pre-shingle repartition (commit 206dd79)
explain the r8->r10 sf1 dedup-family slowdown, or is it ambient/data?

Runs the five mover workloads from the r8/r10 sf1 comparison in ONE
process, ALTERNATING the HINDEX_LSH_PRESHINGLE_REPART knob per
repetition (so host drift hits both arms equally), min-of-N per arm.
corpus_substring_dedup is the knob-insensitive CONTROL: it never
touches the minhash path, so any on/off delta there is pure noise and
calibrates the comparison.

Usage:
    python tools/ab_preshingle.py [sf_dir] [runs_per_arm]

Prints one JSON line: per-workload {on, off, ratio} + the control.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchdata", "sf1",
    )
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from hindex_spark.operators import dedup as dd
    from hindex_spark.session import get_spark

    spark = get_spark("ab_preshingle")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.count()  # warm page cache + JIT entry

    workloads = {
        "dedup_minhash_lsh": lambda: dd.minhash_dedup_pairs(
            docs, "doc_id", "text", 0.9).count(),
        "dedup_minhash_lsh_xxh": lambda: dd.minhash_dedup_pairs(
            docs, "doc_id", "text", 0.9, hash_fn="xxhash64").count(),
        "dedup_minhash_lsh_prod": lambda: dd.minhash_dedup_pairs(
            docs, "doc_id", "text", 0.9, hash_fn="xxhash64",
            max_bucket=4096).count(),
        "corpus_clean": lambda: dd.clean_corpus(
            docs, "doc_id", "text", 0.3, 0.9, method="lsh").count(),
        # CONTROL: no minhash path, knob cannot matter
        "corpus_substring_dedup": lambda: dd.remove_duplicate_spans(
            docs, "doc_id", "text", k=8, hash_unit="xx"
        ).select(F.sum("n_tokens_removed")).collect(),
    }

    def _cleanup(before):
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in set(jmap.keySet()) - before:
            try:
                jmap.get(rid).unpersist()
            except Exception:  # noqa: BLE001
                pass
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001
            pass

    results = {}
    for name, fn in workloads.items():
        best = {"1": None, "0": None}
        for r in range(runs):
            for arm in ("1", "0"):          # alternate within each rep
                os.environ["HINDEX_LSH_PRESHINGLE_REPART"] = arm
                before = set(
                    spark.sparkContext._jsc.getPersistentRDDs().keySet())
                t0 = time.perf_counter()
                fn()
                dt = time.perf_counter() - t0
                _cleanup(before)
                best[arm] = dt if best[arm] is None else min(best[arm], dt)
        os.environ.pop("HINDEX_LSH_PRESHINGLE_REPART", None)
        results[name] = {
            "repart_on_sec": round(best["1"], 3),
            "repart_off_sec": round(best["0"], 3),
            "on_over_off": round(best["1"] / best["0"], 3),
        }
        print(f"# {name}: on={best['1']:.2f}s off={best['0']:.2f}s",
              file=sys.stderr)

    la = os.getloadavg()
    print(json.dumps({
        "sf_dir": sf_dir, "runs_per_arm": runs,
        "loadavg_after": [round(x, 2) for x in la],
        "workloads": results,
    }))


if __name__ == "__main__":
    main()
