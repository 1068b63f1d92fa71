"""Measure the ANN crossover honestly: at bench scale (2k-20k vectors)
brute force beats the IVF probe because one scan stage covers the whole
corpus — the regime IVF exists for is millions of vectors, where
nprobe/n_clusters of the bytes is the difference. This script scales
the sf0.1 embeddings by deterministic key-shifted copies (the
make_sf1.py recipe), builds the persisted AnnIndex once, and times:

  * brute-force cosine top-10 (the exact baseline),
  * AnnIndex exact probe (cluster bucket pruning),
  * AnnIndex ADC probe (PQ codes, column-pruned scan),

each min-of-3, plus recall@10 vs brute force for the pruned probes —
speed without the recall line would be dishonest.

Writes the corpus to ./benchdata/emb_xl (gitignored) and prints one
JSON line. Usage:
    python tools/ann_crossover.py [--copies 50] [--clusters 64]
                                  [--nprobe 4]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1/embeddings.parquet"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "benchdata", "emb_xl")


def make_corpus(spark, copies: int) -> None:
    base = spark.read.parquet(SRC)
    stride = base.agg(F.max("vec_id")).collect()[0][0] + 1
    out = None
    for i in range(copies):
        if i == 0:
            c = base
        else:
            pert = F.transform(
                F.col("embedding"),
                lambda x, j: (
                    x
                    + (
                        F.pmod(
                            F.xxhash64(F.col("vec_id"), j, F.lit(i)),
                            F.lit(200),
                        ).cast("float")
                        - 100.0
                    )
                    / 5000.0
                ).cast("float"),
            )
            c = base.withColumn(
                "vec_id", F.col("vec_id") + i * stride
            ).withColumn("embedding", pert)
        out = c if out is None else out.unionByName(c)
    out.repartition(32).write.mode("overwrite").parquet(OUT)


def timed(fn, runs: int = 3) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 4)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=50)
    ap.add_argument("--clusters", type=int, default=64)
    ap.add_argument("--nprobe", type=int, default=4)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--fresh", action="store_true",
                    help="regenerate the corpus even if it exists")
    args = ap.parse_args()

    from hindex_spark.catalog import Catalog
    from hindex_spark.operators import similarity as sim
    from hindex_spark.operators.ann_index import AnnIndex
    from hindex_spark.session import get_spark

    spark = get_spark("ann_crossover")
    if args.fresh or not os.path.isdir(OUT):
        make_corpus(spark, args.copies)
    emb = spark.read.parquet(OUT)
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )

    cat = Catalog(spark, tempfile.mkdtemp(prefix="ann_crossover_"))
    t0 = time.time()
    ix = AnnIndex.build(
        cat, emb, "vec_id", "embedding", "xl",
        n_clusters=args.clusters, iters=2, pq_m=4, pq_k=16,
    )
    build_s = round(time.time() - t0, 1)

    truth = {
        (r["q_id"], r["vec_id"])
        for r in sim.brute_force_topk(emb, queries, args.k).collect()
    }

    def recall(df) -> float:
        got = {(r["q_id"], r["vec_id"]) for r in df.collect()}
        return round(len(got & truth) / len(truth), 3)

    out = {
        "n_vectors": n,
        "n_clusters": args.clusters,
        "nprobe": args.nprobe,
        "build_sec": build_s,
        "brute_force_sec": timed(
            lambda: sim.brute_force_topk(emb, queries, args.k).collect()
        ),
        "ivf_stored_sec": timed(
            lambda: ix.topk(queries, args.k, nprobe=args.nprobe).collect()
        ),
        "ivf_stored_recall": recall(
            ix.topk(queries, args.k, nprobe=args.nprobe)
        ),
        "ivfpq_stored_sec": timed(
            lambda: ix.topk(
                queries, args.k, nprobe=args.nprobe,
                method="adc", shortlist=2000,
            ).collect()
        ),
        "ivfpq_stored_recall": recall(
            ix.topk(queries, args.k, nprobe=args.nprobe,
                    method="adc", shortlist=2000)
        ),
    }
    shutil.rmtree(cat.root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
