"""Plan-quality regression tests: these assert the physical plans the
100 TB design depends on — filter pushdown into parquet, column pruning,
broadcast semi-joins for index application, partial+final aggregation.
If one of these breaks, correctness tests stay green but scale dies, so
they are tested explicitly."""

import re

from pyspark.sql import functions as F

from hindex_spark import filters as fl
from hindex_spark.index.spec import IndexSpecification
from hindex_spark.table import Scan, Table


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_range_scan_pushes_down_and_prunes(spark, sf_dir):
    t = Table.from_parquet(spark, f"{sf_dir}/orders.parquet", "o_orderkey", "orders")
    df = t.scan(Scan(start_row=100, stop_row=200, columns=["o_custkey"]))
    p = _plan(df)
    assert "GreaterThanOrEqual(o_orderkey,100)" in p
    assert "LessThan(o_orderkey,200)" in p
    # column pruning: only the two needed columns reach the scan
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {
        "o_orderkey",
        "o_custkey",
    }


def test_filter_predicate_reaches_scan(spark, sf_dir):
    t = Table.from_parquet(spark, f"{sf_dir}/lineitem.parquet", "l_orderkey", "li")
    f = fl.SingleColumnValueFilter("l_quantity", fl.GREATER_OR_EQUAL, 45.0, filter_if_missing=True)
    p = _plan(t.scan(Scan(filter=f)))
    assert "GreaterThanOrEqual(l_quantity,45.0)" in p


def test_index_semijoin_is_broadcast(spark, sf_dir):
    t = Table.from_parquet(spark, f"{sf_dir}/orders.parquet", "o_orderkey", "orders")
    t.create_index(IndexSpecification("idx_cust").add_column("o_custkey", "Long"))
    f = fl.SingleColumnValueFilter("o_custkey", fl.EQUAL, 85, filter_if_missing=True)
    df = t.scan(Scan(filter=f))
    df.collect()  # let AQE finalize
    p = _plan(df)
    assert re.search(r"BroadcastHashJoin.*LeftSemi", p)
    # the index-side scan must push the predicate down
    assert "EqualTo(o_custkey,85)" in p


def test_aggregation_is_partial_final(spark, sf_dir):
    t = Table.from_parquet(spark, f"{sf_dir}/lineitem.parquet", "l_orderkey", "li")
    df = t.df.groupBy("l_returnflag").agg(F.sum("l_quantity"))
    p = _plan(df)
    assert p.count("HashAggregate") >= 2  # partial (map-side) + final


def test_point_get_reads_one_predicate(spark, sf_dir):
    t = Table.from_parquet(spark, f"{sf_dir}/orders.parquet", "o_orderkey", "orders")
    p = _plan(t.get(42, columns=["o_custkey"]))
    assert "EqualTo(o_orderkey,42)" in p
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m and "o_totalprice" not in m.group(1)


def test_exists_batch_probe_restricts_before_distinct(spark, sf_dir):
    # HTable.exists(List<Get>) (HTable.java:693) does per-key server
    # probes, never a table scan+shuffle. Our plan must semi-restrict the
    # table to the broadcast probe set BEFORE any distinct/aggregate, so
    # the only table-side rows that reach an Exchange are the probe hits.
    t = Table.from_parquet(spark, f"{sf_dir}/orders.parquet", "o_orderkey", "orders")
    probes = spark.createDataFrame([(1,), (2,), (999999999,)], "o_orderkey long")
    p = _plan(t.exists_batch(probes))
    m = re.search(r"LeftSemi.*?FileScan", p, re.S)
    # the table FileScan is consumed directly by a broadcast LeftSemi join
    # (no Exchange between scan and restriction)
    assert m is not None and "Exchange" not in m.group(0)
    assert "SortMergeJoin" not in p  # full-table shuffle semi-join is a regression


def test_fuzzy_row_prefix_range_pushes_down(spark, sf_dir):
    # FuzzyRowFilter.getNextCellHint analog: the fixed leading prefix of
    # the fuzzy pattern must reach the parquet scan as a rowkey range so
    # row-group min/max pruning fires — the regex alone would force a
    # full scan of the rowkey column at 100 TB.
    t = Table.from_parquet(spark, f"{sf_dir}/part.parquet", "p_name", "part")
    df = t.scan(Scan(filter=fl.FuzzyRowFilter("alm?nd"), columns=["p_partkey"]))
    p = _plan(df)
    assert "GreaterThanOrEqual(p_name,alm)" in p
    assert "LessThan(p_name,aln)" in p


def test_small_dim_join_broadcasts(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    df = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    assert "BroadcastHashJoin" in _plan(df)


def test_minhash_signatures_no_shuffle(spark, sf_dir):
    # the signature job must stay a pure map over the corpus: any
    # Exchange here means a corpus-sized shuffle at 100 TB
    from hindex_spark.operators.dedup import minhash_signatures

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = _plan(minhash_signatures(docs, "doc_id", "text", 3))
    assert "Exchange" not in p


def test_simhash_no_shuffle(spark, sf_dir):
    from hindex_spark.operators.dedup import simhash

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = _plan(simhash(docs, "doc_id", "text", 3))
    assert "Exchange" not in p


def test_simhash_pairs_banded_no_cartesian(spark, sf_dir):
    # the banded pair search must never fall back to a quadratic join:
    # one hash-partitioned exchange on the band bucket, nothing nested-loop.
    from hindex_spark.operators.dedup import simhash_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = _plan(simhash_pairs(docs, "doc_id", "text", 3))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoop" not in p


def test_decontaminate_broadcasts_benchmark(spark, sf_dir):
    from hindex_spark.operators.packing import contaminated_ids

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") < 20)
    train = docs.filter(F.col("doc_id") >= 20)
    p = _plan(contaminated_ids(train, bench, ngram=8))
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p


def test_pack_sequences_single_exchange(spark, sf_dir):
    from hindex_spark.operators.packing import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = _plan(pack_sequences(docs, budget=512))
    assert p.count("Exchange") == 1  # only the per-shard window shuffle


def test_dedup_lines_reassembly_ships_dropped_lines_only(spark, sf_dir):
    # r12 shape: the dedup window (on line text) stays the one
    # corpus-sized shuffle; reassembly aggregates DROPPED line_nos only
    # and gathers from the per-doc line arrays — the old
    # groupBy(doc).collect_list reassembly re-shuffled every surviving
    # line's text (a second corpus-sized exchange). Pin: no corpus
    # line collect (collect_list) anywhere — only the dropped-side
    # collect_set — and never a cartesian.
    from hindex_spark.operators.dedup import dedup_lines, trim_repeated_lines

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for op in (dedup_lines, trim_repeated_lines):
        p = _plan(op(docs, "doc_id", "text"))
        assert "collect_list" not in p, op.__name__
        assert "collect_set" in p, op.__name__      # the dropped-line agg
        assert "CartesianProduct" not in p, op.__name__


def test_minhash_join_no_cartesian(spark, sf_dir):
    from hindex_spark.operators.dedup import minhash_join

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = _plan(minhash_join(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        "doc_id", "text", 0.9))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoop" not in p


def test_shared_span_pairs_hash_join_only(spark, sf_dir):
    # the span self-join must shuffle 8-byte hashes, never text, and
    # never degrade to a nested-loop
    from hindex_spark.operators.dedup import shared_span_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = _plan(shared_span_pairs(docs, "doc_id", "text", span_tokens=8))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p


def test_incremental_dedup_no_cartesian(spark, sf_dir):
    from hindex_spark.operators.dedup import incremental_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = _plan(incremental_dedup(
        docs.filter(F.col("doc_id") % 10 == 0),
        docs.filter(F.col("doc_id") % 10 != 0),
        "doc_id", "text"))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p


def test_semantic_dedup_pair_join_not_cartesian(spark, sf_dir):
    # the within-cluster pair search must be a hash equi-join on the
    # cluster id — the only nested-loop allowed is the tiny broadcast
    # centroid scoring
    from hindex_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    _, dropped = sim.semantic_dedup(emb, eps=0.35, n_clusters=8, iters=0)
    assert "CartesianProduct" not in _plan(dropped)


def test_clean_corpus_keep_best_no_cartesian(spark, sf_dir):
    # the quality-ranked component selection adds one equi-join + one
    # window over the (tiny) component label table — never a nested loop
    from hindex_spark.operators.dedup import clean_corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = _plan(clean_corpus(docs, "doc_id", "text", 0.3, 0.9, keep="best"))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p


def test_pq_encode_no_shuffle_topk_broadcasts_queries(spark, sf_dir):
    # PQ's 100 TB contract: encoding is one narrow projection (codebooks
    # are plan literals — NO Exchange, no Python), and the ADC scan
    # broadcasts the tiny query LUT side so the corpus never shuffles.
    from hindex_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cbs = sim.pq_train(emb, m=4, k=8, sample_size=200)
    codes = sim.pq_encode(emb, cbs)
    enc_plan = _plan(codes)
    assert "Exchange" not in enc_plan
    assert "Python" not in enc_plan and "ArrowEval" not in enc_plan

    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    top = sim.pq_topk(emb, codes, cbs, queries, k=5)
    plan = _plan(top)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # the corpus side must not be broadcast or cartesian-joined
    assert "CartesianProduct" not in plan


def test_verify_replication_digest_join_not_cartesian(spark, sf_dir):
    # verifyrep ships only (rowkey, digest) per side into one full-outer
    # equi-join — never a cartesian, never the wide row payload.
    from hindex_spark.etl import jobs

    src = spark.read.parquet(f"{sf_dir}/customer.parquet")
    peer = src.filter(F.col("c_custkey") % 97 != 0)
    rep = jobs.verify_replication(src, peer, "c_custkey", detail=True)
    plan = _plan(rep)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin FullOuter" in plan or "ShuffledHashJoin FullOuter" in plan \
        or "SortMergeJoin" in plan


def test_minhash_verify_narrows_to_candidates(spark, sf_dir):
    """The verification stage of minhash_dedup_pairs must re-shingle only
    CANDIDATE docs, not the full corpus: the pair set is cached and its
    ids semi-join the corpus before unit arrays are computed. Plan
    evidence: the candidate set appears as an InMemoryRelation and the
    corpus joins it via a semi join; without the narrowing the plan had
    no cache and two full-corpus shingle projections."""
    from hindex_spark.operators.dedup import minhash_dedup_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = minhash_dedup_pairs(docs, "doc_id", "text", 0.9)
    p = _plan(df)
    assert "InMemoryTableScan" in p or "InMemoryRelation" in p
    assert re.search(r"(?i)semi.*join|join.*semi", p), p[:2000]
    assert "CartesianProduct" not in p
    # hygiene: drop the operator's caches so later tests see clean state
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in jmap.keySet():
        jmap.get(rid).unpersist()


def test_dsir_select_broadcast_join_topk_no_global_sort(spark, sf_dir):
    """DSIR selection: the ratio table joins as a broadcast (never a
    corpus-wide SortMergeJoin on the exploded n-gram rows), selection is
    TakeOrderedAndProject (never a global Sort + Limit), and nothing is
    cartesian except the sanctioned 1-row default/total frames."""
    from hindex_spark.operators import importance as imp

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = imp.dsir_select(docs, "doc_id", "text", F.col("lang") == "en", 50)
    p = _plan(df)
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p
    # since the one-pass pair fit, the plan has NO bucket-keyed join at
    # all (the fit is one bounded aggregate; scoring is the broadcast
    # 1-row cross + per-doc fold) — so simply: nothing sort-merge-joins
    # and nothing exchanges on doc id
    assert "SortMergeJoin" not in p
    assert "hashpartitioning(doc_id" not in p


def test_lm_cross_entropy_scoring_is_scan_shaped(spark, sf_dir):
    """The scoring pass is a pure map: fitted log-probs collapse to a
    broadcast map row and each doc folds its own n-gram array — the
    corpus side must see NO exchange keyed on doc id and no join wider
    than the 1-row broadcast cross."""
    from hindex_spark.operators import importance as imp

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = imp.bucket_counts(docs.filter(F.col("lang") == "en"), "text")
    p = _plan(imp.lm_cross_entropy(docs, "doc_id", "text", t))
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    assert "hashpartitioning(doc_id" not in p


def test_dsir_weights_no_doc_keyed_exchange(spark, sf_dir):
    from hindex_spark.operators import importance as imp

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = imp.bucket_counts(docs.filter(F.col("lang") == "en"), "text")
    r = imp.bucket_counts(docs, "text")
    ratios = imp.log_ratio_table(t, r)
    p = _plan(imp.importance_weights(docs, "doc_id", "text", ratios))
    assert "hashpartitioning(doc_id" not in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
