"""Synthesize an sf1-scale bench dataset (10x sf0.1) for the scale
trajectory run: each fact table is 10 deterministic key-shifted copies
of sf0.1, with content perturbed so pipeline workloads keep realistic
selectivity — document texts are per-copy word-shuffled (copies are NOT
near-duplicates, so LSH dedup candidate counts scale like a real corpus
instead of exploding), and embeddings get a small deterministic
perturbation (ANN structure preserved, no exact-duplicate degeneracy).

Writes to ./benchdata/sf1 (gitignored). Usage:
    python tools/make_sf1.py [out_dir]
    SPARK_GRAFT_SF_DIR=$PWD/benchdata/sf1 python bench.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

SRC = "/root/testdata/sf0.1"
COPIES = 10


def _shifted_union(df: DataFrame, build_copy) -> DataFrame:
    out = None
    for i in range(COPIES):
        c = build_copy(df, i)
        out = c if out is None else out.unionByName(c)
    return out


def main():
    from hindex_spark.session import get_spark

    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchdata", "sf1"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("make_sf1")

    t = {n: spark.read.parquet(f"{SRC}/{n}.parquet") for n in (
        "orders", "lineitem", "customer", "documents", "embeddings", "events",
    )}
    # key strides: next power of 10 above each max, so shifted ranges
    # never collide and keys stay recognizable
    def stride(df, col):
        m = df.agg(F.max(col)).first()[0] or 0
        s = 1
        while s <= m:
            s *= 10
        return s

    ord_s = stride(t["orders"], "o_orderkey")
    cust_s = stride(t["customer"], "c_custkey")
    doc_s = stride(t["documents"], "doc_id")
    vec_s = stride(t["embeddings"], "vec_id")
    ev_s = stride(t["events"], "event_id")
    user_s = stride(t["events"], "user_id")

    def orders_copy(df, i):
        return df.withColumn("o_orderkey", F.col("o_orderkey") + i * ord_s).withColumn(
            "o_custkey", F.col("o_custkey") + i * cust_s
        )

    def lineitem_copy(df, i):
        return df.withColumn("l_orderkey", F.col("l_orderkey") + i * ord_s)

    def customer_copy(df, i):
        return df.withColumn("c_custkey", F.col("c_custkey") + i * cust_s)

    def documents_copy(df, i):
        if i == 0:
            return df
        # per-copy deterministic word shuffle: same vocabulary, fresh
        # shingle sets -> copies are not near-duplicates of each other
        words = F.split(F.col("text"), " ")
        shuffled = F.array_join(
            F.transform(
                F.array_sort(
                    F.transform(
                        words,
                        lambda w: F.struct(
                            F.xxhash64(w, F.col("doc_id"), F.lit(i)).alias("h"),
                            w.alias("w"),
                        ),
                    )
                ),
                lambda s: s["w"],
            ),
            " ",
        )
        return df.withColumn("doc_id", F.col("doc_id") + i * doc_s).withColumn(
            "text", shuffled
        )

    def embeddings_copy(df, i):
        if i == 0:
            return df
        pert = F.transform(
            F.col("embedding"),
            lambda x, j: (
                x
                + (
                    F.pmod(F.xxhash64(F.col("vec_id"), j, F.lit(i)), F.lit(200)).cast(
                        "float"
                    )
                    - 100.0
                )
                / 5000.0
            ).cast("float"),
        )
        return df.withColumn("vec_id", F.col("vec_id") + i * vec_s).withColumn(
            "embedding", pert
        )

    def events_copy(df, i):
        return df.withColumn("event_id", F.col("event_id") + i * ev_s).withColumn(
            "user_id", F.col("user_id") + i * user_s
        )

    builders = {
        "orders": orders_copy,
        "lineitem": lineitem_copy,
        "customer": customer_copy,
        "documents": documents_copy,
        "embeddings": embeddings_copy,
        "events": events_copy,
    }
    for name, build in builders.items():
        dst = f"{out_dir}/{name}.parquet"
        _shifted_union(t[name], build).write.mode("overwrite").parquet(dst)
        print(f"{name}: {spark.read.parquet(dst).count()} rows -> {dst}")
    # dims bench does not scale: straight copies so every path resolves
    for name in ("region", "nation", "part", "supplier"):
        spark.read.parquet(f"{SRC}/{name}.parquet").write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )
        print(f"{name}: copied")


if __name__ == "__main__":
    main()
