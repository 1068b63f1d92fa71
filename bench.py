"""Benchmark harness: the reference's PerformanceEvaluation workload set
(PerformanceEvaluation.java:147-167) mapped onto this engine, plus the
index-accelerated filterScan variants the fork exists for, plus the
data-pipeline headliners.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    from hindex_spark import filters as fl
    from hindex_spark.index.spec import IndexSpecification
    from hindex_spark.operators import dedup as dd
    from hindex_spark.operators import similarity as sim
    from hindex_spark.operators import text as tx
    from hindex_spark.session import get_spark
    from hindex_spark.table import Scan, Table

    spark = get_spark("hindex_bench")
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]

    orders = Table.from_parquet(spark, f"{SF_DIR}/orders.parquet", "o_orderkey", "orders")
    lineitem = Table.from_parquet(spark, f"{SF_DIR}/lineitem.parquet", "l_orderkey", "lineitem")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    # Index tables are part of the database, not of the query: build +
    # cache once (the reference maintains T_idx persistently too).
    orders.create_index(IndexSpecification("idx_cust").add_column("o_custkey", "Long"))
    orders.cache()
    orders.index_tables["idx_cust"].count()

    n_orders = orders.df.count()  # warm JVM + page cache

    timings = {}
    spreads = {}
    errors = {}
    load_before = os.getloadavg()

    def _persistent_ids():
        return set(spark.sparkContext._jsc.getPersistentRDDs().keySet())

    db_ids = None  # snapshot of database-level caches, set after setup

    def bench(name, fn, runs=2):
        # One workload must never zero the whole artifact (r2 lost its
        # bench to a single AnalysisException): record the failure and
        # keep going. Setup belongs INSIDE fn so its errors land here.
        #
        # Each workload runs `runs` times and the MINIMUM is recorded:
        # the first execution pays whole-stage-codegen JIT compilation
        # (measured 4x on corpus_clean: 9.7 s cold vs 2.0-2.5 s warm),
        # which is one-time cost, not plan quality. Mirrors the
        # reference's PerformanceEvaluation running workloads repeatedly
        # per client (PerformanceEvaluation.java:532+).
        # Cache hygiene between workloads: pipeline ops stage
        # intermediates (clean_corpus persists its deduped corpus, CC
        # localCheckpoints labels). In production each job's executors
        # release those at exit; in this one-JVM harness they pile up
        # and the resulting GC pressure made corpus_clean swing 1.6-5.0s
        # run to run. Unpersist whatever a workload newly persisted
        # (keeping the database-level caches from setup) so every
        # workload starts from the same storage state.
        try:
            best = None
            samples = []
            for _ in range(runs):
                before = _persistent_ids()
                t0 = time.perf_counter()
                fn()
                dt = time.perf_counter() - t0
                samples.append(dt)
                best = dt if best is None else min(best, dt)
                jmap = spark.sparkContext._jsc.getPersistentRDDs()
                for rid in set(jmap.keySet()) - (db_ids if db_ids is not None else before):
                    try:
                        jmap.get(rid).unpersist()
                    except Exception:  # noqa: BLE001 - already released
                        pass
                # Heap hygiene BETWEEN RUNS, not just between workloads:
                # a heavy run's old-gen garbage (e.g. 20M+ LSH candidate
                # pairs) inflates the NEXT run of the SAME workload —
                # measured at sf1: corpus_clean swings 7 s -> 88 s
                # run-to-run without this, so min-of-N never reaches
                # steady state. The collection runs outside the timed
                # region; in production each job has its own executors,
                # so this isolation is free there.
                try:
                    spark.sparkContext._jvm.System.gc()
                except Exception:  # noqa: BLE001 - measurement aid only
                    pass
            timings[name] = round(best, 4)
            # ambient instrumentation: the recorded per-line MIN is the
            # headline, but the full sample lets round-over-round diffs
            # separate plan regressions from host noise (this host's
            # idle-vs-loaded band at sf0.1 spans ~21-47 s total)
            spreads[name] = [round(s, 4) for s in sorted(samples)]
        except Exception as exc:  # noqa: BLE001 - reported, not swallowed
            msg = str(exc).splitlines()[0] if str(exc) else ""
            errors[name] = f"{type(exc).__name__}: {msg[:200]}"

    db_ids = _persistent_ids()  # the table/index caches = the database

    # --- PE workloads -----------------------------------------------------
    bench("random_read", lambda: orders.get(n_orders // 2).collect())

    def scan_range(n):
        start = n_orders // 3
        return lambda: orders.scan(
            Scan(start_row=start, stop_row=start + n)
        ).collect()

    bench("scan_range_10", scan_range(10))
    bench("scan_range_100", scan_range(100))
    bench("scan_range_1000", scan_range(1000))
    bench("scan_range_10000", scan_range(10000))

    bench("sequential_read", lambda: lineitem.scan(Scan()).count())

    f_sel = fl.FilterList(
        "AND",
        [
            fl.SingleColumnValueFilter("l_quantity", fl.GREATER_OR_EQUAL, 49.0, filter_if_missing=True),
            fl.SingleColumnValueFilter("l_discount", fl.GREATER_OR_EQUAL, 0.09, filter_if_missing=True),
        ],
    )
    bench("filter_scan", lambda: lineitem.scan(Scan(filter=f_sel)).count())

    f_idx = fl.SingleColumnValueFilter("o_custkey", fl.EQUAL, 85, filter_if_missing=True)
    bench("index_filter_scan", lambda: orders.scan(Scan(filter=f_idx)).collect())

    # sequential_write runs against the engine's OWN storage layout
    # (cataloged bucketed table): the put's full-outer merge then needs
    # no Exchange on the table side — the shape that survives 100 TB.
    # The one-time bucketed save is database setup, not the workload.
    import tempfile

    from hindex_spark.catalog import Catalog

    try:
        cat = Catalog(spark, tempfile.mkdtemp(prefix="hx_bench_wh_"))
        cat.save(
            Table(orders.df, "o_orderkey", "orders_w"), num_partitions=32
        )
        orders_w = cat.load("orders_w")
    except Exception as exc:  # noqa: BLE001
        orders_w = None
        errors["sequential_write"] = f"setup: {type(exc).__name__}: {exc}"[:220]

    def seq_write():
        puts = orders_w.df.limit(10000).select(
            "o_orderkey", (F.col("o_totalprice") * 1.1).alias("o_totalprice")
        )
        orders_w.put(puts).df.count()

    if orders_w is not None:
        bench("sequential_write", seq_write)

    # The fork's headline write cost: the same put against a table WITH
    # a maintained secondary index — data merge + index delta derivation
    # in one batch job (IndexRegionObserver.preBatchMutate analog). The
    # delta over sequential_write is the price of synchronous index
    # maintenance; the index side is keyed by affected rowkeys only, so
    # the overhead is proportional to the batch, not the table.
    try:
        cat.save(
            Table(orders.df, "o_orderkey", "orders_wi"), num_partitions=32
        )
        orders_wi = cat.load("orders_wi")
        orders_wi.create_index(
            IndexSpecification("idx_cust_w").add_column("o_custkey", "Long")
        )
        orders_wi.index_tables["idx_cust_w"].count()
    except Exception as exc:  # noqa: BLE001
        orders_wi = None
        errors["indexed_write"] = f"setup: {type(exc).__name__}: {exc}"[:220]

    def idx_write():
        puts = orders_wi.df.limit(10000).select(
            "o_orderkey", (F.col("o_custkey") + 1).alias("o_custkey")
        )
        t2 = orders_wi.put(puts)
        t2.df.count()
        t2.index_tables["idx_cust_w"].count()

    if orders_wi is not None:
        bench("indexed_write", idx_write)

    # --- aggregation ------------------------------------------------------
    def q1():
        (
            lineitem.df.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity").alias("sum_qty"),
                F.sum("l_extendedprice").alias("sum_base_price"),
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
                F.avg("l_quantity").alias("avg_qty"),
                F.avg("l_discount").alias("avg_disc"),
                F.count("*").alias("count_order"),
            )
            .collect()
        )

    bench("agg_q1", q1)
    from hindex_spark import aggregations as agg
    bench("agg_median", lambda: agg.agg_median(lineitem, "l_extendedprice"))

    # --- data-pipeline ops --------------------------------------------------
    # min-of-3 for the hash-path pair: their delta (~0.2 s standalone:
    # 1.70 md5 vs 1.49 xxh) is near the one-JVM run-to-run noise floor,
    # and two runs were occasionally ordering the pair backwards.
    bench(
        "dedup_minhash_lsh",
        lambda: dd.minhash_dedup_pairs(docs, "doc_id", "text", 0.9).count(),
        runs=3,
    )
    # Same LSH workload on the xxhash64 production digest (verification
    # is exact Jaccard either way, so results agree): quantifies what
    # the md5-for-oracle-reproducibility choice costs on the hot path.
    # Since round 12 this line carries the DEFAULT configuration, which
    # for xxhash64 resolves the skew valve to "auto" (BY_HASH sentinel)
    # — the unvalved counterfactual is the _unvalved line below.
    bench(
        "dedup_minhash_lsh_xxh",
        lambda: dd.minhash_dedup_pairs(
            docs, "doc_id", "text", 0.9, hash_fn="xxhash64"
        ).count(),
        runs=3,
    )
    # Explicit opt-OUT of the valve: what the pre-r12 xxh default cost.
    # At sf1 this line recorded 30-55 s vs the valved path's 6-9 s with
    # identical verified pairs — the measured case for the new default.
    bench(
        "dedup_minhash_lsh_xxh_unvalved",
        lambda: dd.minhash_dedup_pairs(
            docs, "doc_id", "text", 0.9, hash_fn="xxhash64", max_bucket=None
        ).count(),
        runs=2,
    )
    # The full production configuration: xxhash64 digests + the
    # max_bucket boilerplate valve. Unbounded banding is quadratic in
    # the largest bucket, and which shingle lands a band minimum is
    # hash-family luck — at 10x bench scale one 6.6k-doc bucket put 22M
    # of the xxh path's 26M candidate pairs (the md5 family drew a 1.9k
    # bucket on the same corpus). The valve drops such buckets before
    # expansion; verified pairs are unchanged (members still pair
    # through their other, more selective bands).
    bench(
        "dedup_minhash_lsh_prod",
        lambda: dd.minhash_dedup_pairs(
            docs, "doc_id", "text", 0.9, hash_fn="xxhash64", max_bucket=4096
        ).count(),
        runs=3,
    )
    # The tuned high-threshold family: 16 hashes in 4 bands of 4 puts
    # the LSH candidate knee at s ~ 0.66 (vs ~ 0.5 for the oracle-pinned
    # (8, 2)), with 98.6% theoretical recall at s = 0.9. Measured at
    # sf1: 4.9M -> 0.30M candidates, 11.0 s -> 1.3 s end-to-end, and it
    # VERIFIED one more pair than the valved (8, 2) xxh run (tighter
    # buckets stay under the skew valve, so nothing real is dropped).
    # This is the configuration a 100 TB dedup job should run.
    bench(
        "dedup_minhash_lsh_tuned",
        lambda: dd.minhash_dedup_pairs(
            docs, "doc_id", "text", 0.9, hash_fn="xxhash64", max_bucket=4096,
            n_hashes=16, band_size=4,
        ).count(),
        runs=3,
    )
    bench(
        "text_analyze",
        lambda: tx.analyze(docs).select(F.max("quality"), F.max("n_tokens")).collect(),
    )

    # DSIR importance selection end-to-end: fit target+raw hashed-ngram
    # distributions (two bounded hash aggregates), score every doc via
    # broadcast join + decimal sum, take top 10% — the corpus-wide
    # data-selection pass of a training-data pipeline. Uses the xxhash64
    # production hash (oracle gates keep md5).
    def dsir():
        from hindex_spark.operators import importance as imp

        k = max(docs.count() // 10, 10)
        imp.dsir_select(
            docs, "doc_id", "text", F.col("lang") == "en", k, hash_fn="xxhash64"
        ).count()

    bench("corpus_dsir_select", dsir, runs=3)

    # ExactSubstr-style duplicate-span removal (the heaviest dedup
    # granularity: every overlapping k-gram occurrence goes through ONE
    # gram-keyed window shuffle). xxhash64 unit keys keep the shuffle
    # rows at 8 bytes — the 100 TB configuration.
    bench(
        "corpus_substring_dedup",
        lambda: dd.remove_duplicate_spans(
            docs, "doc_id", "text", k=8, hash_unit="xx"
        ).select(F.sum("n_tokens_removed")).collect(),
    )

    # BM25: the full corpus scan vs the persisted inverted index. The
    # index build is database setup (one corpus pass, like the index
    # builds above); the query-time delta is the point — a 3-term query
    # reads 3 of 32 postings buckets instead of every document.
    from hindex_spark.operators.search import SearchIndex, bm25_topk

    bench(
        "bm25_scan_topk",
        lambda: bm25_topk(
            docs, "doc_id", "text", "spark merge vector", k=25
        ).collect(),
        runs=3,
    )
    try:
        search_ix = SearchIndex.build(cat, docs, "doc_id", "text", "bench_docs")
    except Exception as exc:  # noqa: BLE001
        search_ix = None
        errors["bm25_indexed_topk"] = f"setup: {type(exc).__name__}: {exc}"[:220]
    if search_ix is not None:
        bench(
            "bm25_indexed_topk",
            lambda: search_ix.topk("spark merge vector", k=25).collect(),
            runs=3,
        )

    def ann():
        queries_df = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
        )
        sim.brute_force_topk(emb, queries_df, 10).collect()

    # runs=3: vectorized fold JIT needs a third run to reach steady
    # state on a fresh JVM (measured 3.6 / 1.2 / 0.53 s at sf1).
    bench("ann_bruteforce_topk", ann, runs=3)

    # The IVF scale path: index build (sampled k-means) is database
    # setup — one-time, like the secondary-index build — and the probe
    # workload is what repeats per query batch. At sf0.1 (2k vectors)
    # the probe's extra stages (centroid scoring window + cluster join)
    # cost more than they save — brute force scores all 2k rows in one
    # stage — so expect ivf >= bruteforce HERE; the crossover is where
    # nprobe/n_clusters of the corpus no longer fits one stage's scan
    # budget (millions of vectors), which is the regime IVF exists for.
    try:
        ivf_asn, ivf_cent = sim.ivf_build(emb, n_clusters=16, iters=2)
        # the materialized IVF index: vectors stored WITH their cluster
        # (in production, written out partitioned by cluster)
        ivf_store = emb.join(ivf_asn, "vec_id").persist()
        ivf_store.count()
    except Exception as exc:  # noqa: BLE001
        ivf_store = None
        errors["ann_ivf_topk"] = f"setup: {type(exc).__name__}: {exc}"[:220]

    def ann_ivf():
        queries_df = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
        )
        sim.ivf_topk(emb, ivf_store, ivf_cent, queries_df, 10, nprobe=2).collect()

    if ivf_store is not None:
        db_ids = _persistent_ids()  # the IVF index joins the database caches
        bench("ann_ivf_topk", ann_ivf, runs=3)

    # The PERSISTED IVF artifact: build (train + assign + bucketed
    # write) is one-time setup; the timed probe opens nothing and scans
    # only its nprobe clusters' buckets (bucket pruning) — the path a
    # repeated query batch pays against a 100 TB vector store.
    try:
        from hindex_spark.operators.ann_index import AnnIndex

        ann_ix = AnnIndex.build(
            cat, emb, "vec_id", "embedding", "bench_vecs",
            n_clusters=16, iters=2,
        )
    except Exception as exc:  # noqa: BLE001
        ann_ix = None
        errors["ann_ivf_stored_topk"] = f"setup: {type(exc).__name__}: {exc}"[:220]

    def ann_ivf_stored():
        queries_df = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
        )
        ann_ix.topk(queries_df, 10, nprobe=2).collect()

    if ann_ix is not None:
        bench("ann_ivf_stored_topk", ann_ivf_stored, runs=3)

    # IVF-PQ: same persisted layout + product-quantized codes; the ADC
    # shortlist scan reads (cluster, id, codes, norm) only — the
    # bytes-read dial PQ exists for. Build is one-time setup.
    try:
        ann_pq = AnnIndex.build(
            cat, emb, "vec_id", "embedding", "bench_vecs_pq",
            n_clusters=16, iters=2, pq_m=4, pq_k=16,
        )
    except Exception as exc:  # noqa: BLE001
        ann_pq = None
        errors["ann_ivfpq_stored_topk"] = f"setup: {type(exc).__name__}: {exc}"[:220]

    def ann_ivfpq_stored():
        queries_df = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
        )
        ann_pq.topk(
            queries_df, 10, nprobe=2, method="adc", shortlist=100
        ).collect()

    if ann_pq is not None:
        bench("ann_ivfpq_stored_topk", ann_ivfpq_stored, runs=3)

    # --- joins & temporal -------------------------------------------------
    def join_q3():
        cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").filter(
            F.col("c_mktsegment") == "BUILDING"
        )
        (
            lineitem.df.join(
                orders.df.filter(F.col("o_orderdate") < "1997-06-01"),
                lineitem.df.l_orderkey == orders.df.o_orderkey,
            )
            .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
            .groupBy("o_orderkey")
            .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
            .orderBy(F.col("revenue").desc())
            .limit(10)
            .collect()
        )

    bench("join_q3_topk", join_q3)

    # The same Q3 against the engine's OWN storage layout: orders and
    # lineitem cataloged bucketed-by-orderkey (32 buckets, one file per
    # bucket, SORTED BY honored). The one-time saves are database
    # setup — like the index builds above — and the orders⋈lineitem
    # sort-merge join then needs NO Exchange on either fact side (the
    # groupBy(o_orderkey) also reuses the join's partitioning). The
    # delta vs join_q3_topk quantifies the shuffle the catalog layout
    # removes — the dominant cost of the raw variant at sf1+.
    try:
        li_b_tbl = Table(
            spark.read.parquet(f"{SF_DIR}/lineitem.parquet"),
            "l_orderkey",
            "lineitem_b",
        )
        cat.save(li_b_tbl, num_partitions=32)
        lineitem_b = cat.load("lineitem_b")
        orders_b = cat.load("orders_w")  # already bucketed on o_orderkey
    except Exception as exc:  # noqa: BLE001
        lineitem_b = None
        errors["join_q3_topk_bucketed"] = f"setup: {type(exc).__name__}: {exc}"[:220]

    def join_q3_bucketed():
        cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").filter(
            F.col("c_mktsegment") == "BUILDING"
        )
        (
            lineitem_b.df.join(
                orders_b.df.filter(F.col("o_orderdate") < "1997-06-01"),
                lineitem_b.df.l_orderkey == orders_b.df.o_orderkey,
            )
            .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
            .groupBy("o_orderkey")
            .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
            .orderBy(F.col("revenue").desc())
            .limit(10)
            .collect()
        )

    if lineitem_b is not None:
        bench("join_q3_topk_bucketed", join_q3_bucketed)

    from hindex_spark.operators.temporal import as_of_join, session_stats
    from hindex_spark.timeutil import ts_micros

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")

    def _ev():
        return events.select("event_id", "user_id", ts_micros(events).alias("t"))

    # runs=3 for the window-function pair below: same fresh-JVM JIT
    # variance as the ANN fold (2x run-to-run swing at sf1).
    bench(
        "sessionize",
        lambda: session_stats(_ev(), "user_id", "t", 3_600_000_000).count(),
        runs=3,
    )

    def asof():
        right = events.filter(F.col("event_type") == "error").select(
            "user_id", ts_micros(events).alias("rt")
        )
        as_of_join(_ev(), right, "user_id", "t", "rt", ["rt"]).count()

    bench("asof_join", asof, runs=3)

    def range_join_attr():
        from hindex_spark.operators.temporal import range_join

        hour = 3_600_000_000
        clicks = events.filter(F.col("event_type") == "click").select(
            "user_id", ts_micros(events).alias("t"))
        purch = events.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"), "user_id",
            (ts_micros(events) - hour).alias("ws"),
            ts_micros(events).alias("we"))
        range_join(clicks, purch, "t", "ws", "we", key="user_id",
                   bucket_width=hour).groupBy("purchase_id").count().count()

    bench("range_join_attribution", range_join_attr, runs=3)

    def chunk_docs():
        from hindex_spark.operators.packing import chunk_documents

        chunk_documents(docs, max_tokens=32, overlap=8).count()

    bench("chunk_documents", chunk_docs, runs=3)

    # Record linkage: all customer-name pairs within one edit via
    # SymSpell deletion-neighborhood blocking — linear signatures +
    # one variant-keyed shuffle vs the quadratic all-pairs scan the
    # oracle runs (15k names here; at 100 TB the all-pairs version is
    # simply not runnable).
    def edit_pairs():
        from hindex_spark.operators.linkage import edit_distance_pairs

        cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
        edit_distance_pairs(cust, "c_custkey", "c_name", 1).count()

    bench("edit_distance_pairs", edit_pairs, runs=3)

    # Z-order layout job: quantize stats + one range exchange + sorted
    # write — the write-time cost that buys multi-column file/row-group
    # skipping (measured in tests/test_layout.py: a 2% one-column
    # predicate touches <= half the files vs ~all on a hash layout).
    import tempfile as _tf

    _zdir = _tf.mkdtemp(prefix="bench_zorder_") + "/events_z"

    def zorder_write():
        from hindex_spark.operators.layout import zorder_frame

        zorder_frame(events, ["user_id", "ts"], num_partitions=32)\
            .write.mode("overwrite").parquet(_zdir)

    bench("zorder_layout_write", zorder_write, runs=3)

    # Incremental join view: the per-batch maintenance cost (delta
    # joined against the bucketed other side + delta-sized appends) and
    # the read cost (a scan of the materialized result — NEVER a join).
    # Contrast with join_q3_topk's full join: at 100 TB the recompute
    # grows with both tables, the delta update only with the batch.
    from hindex_spark.operators.joinview import JoinView

    try:
        jv_orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
            "o_orderkey", "o_custkey", "o_orderstatus"
        )
        jv_items = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
            F.col("l_orderkey").alias("o_orderkey"), "l_linenumber",
            "l_quantity",
        )
        jv_store = JoinView.build(
            cat, jv_orders, jv_items.filter(F.col("l_linenumber") <= 5),
            "o_orderkey", "bench_oi",
        )
        jv_delta = jv_items.filter(F.col("l_linenumber") == 6)
    except Exception as exc:  # noqa: BLE001
        jv_store = None
        errors["joinview_delta_update"] = (
            f"setup: {type(exc).__name__}: {exc}"[:220]
        )
    if jv_store is not None:
        bench(
            "joinview_delta_update",
            lambda: jv_store.update_right(jv_delta),
            runs=2,
        )
        bench(
            "joinview_read",
            lambda: jv_store.read().count(),
            runs=3,
        )

    # Continuous aggregate: the same hourly query against the persisted
    # rollup store (merged partials, store-side exchange-free) vs
    # aggregating the raw events every time. The store build is
    # database setup; the query-time delta is what materialization
    # buys — and it widens with event volume, since the store is
    # bounded by (buckets x keys), not rows.
    from hindex_spark.operators.rollup import HOUR_US, RollupStore, rollup_partials

    def rollup_direct():
        rollup_partials(events, "ts", ["event_type"], "value", HOUR_US).count()

    bench("rollup_direct_hourly", rollup_direct, runs=3)
    try:
        rollup_store = RollupStore.build(
            cat, events, "ts", ["event_type"], "value", HOUR_US, "bench_events"
        )
    except Exception as exc:  # noqa: BLE001
        rollup_store = None
        errors["rollup_store_read"] = f"setup: {type(exc).__name__}: {exc}"[:220]
    if rollup_store is not None:
        bench(
            "rollup_store_read",
            lambda: rollup_store.read().count(),
            runs=3,
        )
        # sliding read: 6h window advancing hourly from the same store —
        # the delta vs rollup_store_read is the 6x bucket explosion +
        # the (win, key) merge, the price of overlap without a rescan
        bench(
            "rollup_sliding_read",
            lambda: rollup_store.read_sliding(
                6 * HOUR_US, HOUR_US).count(),
            runs=3,
        )

    def funnel_q():
        from hindex_spark.operators.temporal import funnel

        funnel(
            events.select("user_id", "event_type",
                          ts_micros(events).alias("t")),
            "user_id", "t", "event_type",
            ["signup", "click", "purchase"],
            within=48 * HOUR_US,
        ).count()

    bench("funnel_3step", funnel_q, runs=3)

    # Sketch-carrying rollup (HLL distinct users + KLL value quantiles
    # per bucket): the read-time delta vs rollup_store_read is what the
    # two mergeable sketch columns cost — union + estimate at the edge
    # instead of plain sum/min/max folds.
    try:
        rollup_sk = RollupStore.build(
            cat, events, "ts", ["event_type"], "value",
            HOUR_US, "bench_events_sk", ndv_col="user_id",
            pctl_col="value",
        )
    except Exception as exc:  # noqa: BLE001
        rollup_sk = None
        errors["rollup_store_read_sketches"] = (
            f"setup: {type(exc).__name__}: {exc}"[:220]
        )
    if rollup_sk is not None:
        bench(
            "rollup_store_read_sketches",
            lambda: rollup_sk.read(pctls=(0.5, 0.95)).count(),
            runs=3,
        )

    # Hot-bucket escape on a synthetic HOT-HOUR corpus (every event in
    # one time bucket, high key cardinality — the shape that serializes
    # the exchange-free merge into one task). spread_keys="auto" gauges
    # the store's own bucket distribution and opts into the spreading
    # exchange; the delta vs the clustered read is what the escape buys
    # when skew is real.
    try:
        one_ts = events.select("ts").first()[0]
        hot_store = RollupStore.build(
            cat,
            events.withColumn("ts", F.lit(one_ts)).withColumn(
                "event_type", F.concat(F.lit("k"), F.col("event_id") % 20000)
            ),
            "ts", ["event_type"], "value", HOUR_US, "bench_hot_events",
        )
    except Exception as exc:  # noqa: BLE001
        hot_store = None
        errors["rollup_hot_read_auto"] = f"setup: {type(exc).__name__}: {exc}"[:220]
    if hot_store is not None:
        bench(
            "rollup_hot_read_clustered",
            lambda: hot_store.read(spread_keys=False).count(),
            runs=3,
        )
        bench(
            "rollup_hot_read_auto",
            lambda: hot_store.read(spread_keys="auto").count(),
            runs=3,
        )

    # runs=3: the widest run-to-run GC variance of any workload at sf1
    # (multi-stage: quality filter + exact dedup + LSH + clustering);
    # three runs with inter-run collection reach steady state reliably.
    bench(
        "corpus_clean",
        lambda: dd.clean_corpus(docs, "doc_id", "text", 0.3, 0.9, method="lsh").count(),
        runs=3,
    )

    # Steady-state incremental dedup: a ~1% "daily batch" against the
    # historical corpus, tuned (16,4) family both ways. The recompute
    # variant re-shingles the FULL corpus text per batch; the store
    # variant derives corpus bands from the persisted narrow signature
    # table (DedupState — built once, database setup, like the index
    # builds above) and touches corpus text only for candidate
    # verification. The delta is the dominant per-batch cost of the
    # daily-crawl shape at 100 TB, where the corpus re-shingle is a
    # full-corpus map pass every day.
    dd_corpus = docs.filter(F.col("doc_id") % 101 != 0)
    dd_batch = docs.filter(F.col("doc_id") % 101 == 0)
    try:
        from hindex_spark.operators.dedup_state import DedupState

        dd_state = DedupState.build(
            cat, dd_corpus, "doc_id", "text", "bench_docs",
            n_hashes=16, band_size=4,
        )
    except Exception as exc:  # noqa: BLE001
        dd_state = None
        errors["dedup_incremental_store"] = (
            f"setup: {type(exc).__name__}: {exc}"[:220]
        )

    bench(
        "dedup_incremental",
        lambda: dd.incremental_dedup(
            dd_batch, dd_corpus, "doc_id", "text", 0.9,
            n_hashes=16, band_size=4,
        ).count(),
        runs=3,
    )
    if dd_state is not None:
        bench(
            "dedup_incremental_store",
            lambda: dd_state.dedup_batch(dd_batch, dd_corpus, 0.9).count(),
            runs=3,
        )

    # Real media decode through the pure-Python codec seam: synthesize
    # WAV/AVI containers per doc and decode them back (full sample /
    # frame decode), Arrow-batched end to end — the per-byte Python
    # decode cost is the number that must stay flat per-partition at
    # 100 TB (it parallelizes per Arrow batch with zero shuffle).
    from hindex_spark.operators import multimodal as mmod

    bench(
        "media_audio_decode",
        lambda: mmod.audio_stats(mmod.attach_audio_blob(docs))
        .agg(F.sum("n_frames")).collect(),
        runs=3,
    )
    bench(
        "media_video_decode",
        lambda: mmod.video_frame_features(mmod.attach_video_blob(docs), every=2)
        .agg(F.count("*"), F.sum("max_px")).collect(),
        runs=3,
    )

    total = round(sum(timings.values()), 4)
    # The ONE stdout line is the driver's evidence channel and its tail
    # capture is bounded: round 11's run-sample additions pushed the
    # line past the cap and BENCH_r11.json recorded parsed=null. Keep
    # stdout to the compact scalar-min shape and sidecar everything
    # diagnostic (per-line sorted run samples — min == the recorded
    # timing — plus a host-load fingerprint, so artifact diffs can
    # auto-filter ambient noise from real regressions).
    out = {
        "metric": "bench_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
    }
    detail = {
        "sf": float(sf),
        "run_samples": spreads,
        "loadavg_before": [round(x, 2) for x in load_before],
        "loadavg_after": [round(x, 2) for x in os.getloadavg()],
    }
    if errors:
        # A partial total is not comparable to a complete one: null the
        # headline value so downstream comparisons can't mistake it.
        out["errors"] = errors
        out["partial"] = True
        out["value"] = None
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_detail.json"
    )
    try:
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1)
    except OSError as e:  # diagnostics must never cost the artifact
        print(f"bench: could not write {detail_path}: {e}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
