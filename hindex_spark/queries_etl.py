"""ETL-tool queries (SURVEY §2.1): the tool surface exercised through
the correctness gate — CopyTable, RowCounter, CellCounter, ImportTsv
round-trip."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from hindex_spark.etl import jobs
from hindex_spark.queries import query


@query(
    "etl_copy_table",
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
       WHERE o_orderkey >= 200 AND o_orderkey < 800 AND o_orderstatus = 'O'""",
)
def q_etl_copy(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return jobs.copy_table(
        df,
        "o_orderkey",
        start_row=200,
        stop_row=800,
        predicate=F.col("o_orderstatus") == "O",
        columns=["o_custkey", "o_totalprice"],
    )


@query(
    "etl_row_counter",
    "SELECT COUNT(*) AS row_count FROM lineitem",
)
def q_etl_rowcount(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return jobs.row_counter(df, "l_orderkey")


@query(
    "etl_cell_counter",
    """SELECT COUNT(*) AS row_count,
              COUNT(p_name) AS cells_p_name,
              COUNT(p_brand) AS cells_p_brand,
              COUNT(p_type) AS cells_p_type,
              COUNT(p_size) AS cells_p_size,
              COUNT(p_retailprice) AS cells_p_retailprice
       FROM part""",
)
def q_etl_cellcount(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/part.parquet")
    return jobs.cell_counter(df, "p_partkey")


@query(
    "setop_intersect_except",
    """SELECT o_orderkey, 'both' AS src FROM (
         SELECT o_orderkey FROM orders WHERE o_custkey < 50
         INTERSECT
         SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O')
       UNION ALL
       SELECT o_orderkey, 'only_a' AS src FROM (
         SELECT o_orderkey FROM orders WHERE o_custkey < 50
         EXCEPT
         SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O')""",
)
def q_setops(spark, sf_dir):
    """Relational set ops (SURVEY §2.6: trivial Spark mapping)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    a = orders.filter(F.col("o_custkey") < 50).select("o_orderkey")
    b = orders.filter(F.col("o_orderstatus") == "O").select("o_orderkey")
    both = a.intersect(b).select("o_orderkey", F.lit("both").alias("src"))
    only_a = a.exceptAll(b).distinct().select("o_orderkey", F.lit("only_a").alias("src"))
    return both.unionByName(only_a)


@query(
    "dsl_parse_filter",
    """SELECT p_partkey, p_name, p_size FROM part
       WHERE (p_size > 45 OR p_size < 3) AND p_type = 'ECONOMY'""",
)
def q_dsl(spark, sf_dir):
    """ParseFilter string DSL through the scan path (ParseFilter.java
    syntax with typed columns)."""
    from hindex_spark.parse_filter import parse_filter
    from hindex_spark.table import Scan, Table

    t = Table.from_parquet(spark, f"{sf_dir}/part.parquet", "p_partkey", "part")
    f = parse_filter(
        "(SingleColumnValueFilter('p_size', >, 'binary:45', 1) OR "
        "SingleColumnValueFilter('p_size', <, 'binary:3', 1)) AND "
        "SingleColumnValueFilter('p_type', =, 'binary:ECONOMY', 1)"
    )
    return t.scan(Scan(filter=f, columns=["p_name", "p_size"]))


@query(
    "scan_sql_where",
    """SELECT o_orderkey, o_totalprice FROM orders
       WHERE o_totalprice > 100000 AND o_orderpriority = '1-URGENT'""",
)
def q_sql_where(spark, sf_dir):
    from hindex_spark.table import Table

    t = Table.from_parquet(spark, f"{sf_dir}/orders.parquet", "o_orderkey", "orders")
    return t.scan_where(
        "o_totalprice > 100000 AND o_orderpriority = '1-URGENT'", ["o_totalprice"]
    )


@query(
    "etl_export_import",
    """SELECT n_nationkey, n_name, n_regionkey FROM nation""",
)
def q_etl_export_import(spark, sf_dir):
    """Export/Import round-trip (SURVEY §2.1,
    hbase-server/.../mapreduce/Export.java / Import.java): dump the table
    to files, restore from the dump, result must equal the source."""
    src = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    tmp = tempfile.mkdtemp(prefix="hindex_export_")
    jobs.export_table(src, f"{tmp}/nation_dump")
    return jobs.import_table(spark, f"{tmp}/nation_dump")


@query(
    "etl_snapshot_scan",
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
       WHERE o_orderkey < 1000""",
)
def q_etl_snapshot_scan(spark, sf_dir):
    """TableSnapshotInputFormat (hbase-server/.../mapreduce/
    TableSnapshotInputFormat.java): scan an immutable snapshot without
    touching the live table. Save a table, snapshot it, mutate the live
    table, then read the snapshot — it must show the pre-mutation rows."""
    from hindex_spark.catalog import Catalog
    from hindex_spark.table import Table

    src = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderkey") < 1000
    ).select("o_orderkey", "o_custkey", "o_totalprice")
    cat = Catalog(spark, tempfile.mkdtemp(prefix="hindex_snap_"))
    cat.save(Table(src, "o_orderkey", "orders_s"), num_partitions=4)
    cat.snapshot("orders_s", "s1")
    # mutate the live table AFTER the snapshot
    live = cat.load("orders_s").delete_where(F.col("o_orderkey") < 500)
    cat.save(live, num_partitions=4)
    return cat.load("orders_s@s1").df


@query(
    "streaming_walplayer",
    """SELECT n_nationkey, n_name, n_regionkey FROM (
         SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_nationkey <> 3
         UNION ALL
         SELECT 990 AS n_nationkey, 'STREAMED' AS n_name, 1 AS n_regionkey
       )""",
)
def q_streaming_walplayer(spark, sf_dir):
    """WALPlayer (hbase-server/.../mapreduce/WALPlayer.java): replay a
    change log into a table through the Structured Streaming ingest path
    (one micro-batch = one atomic table version, the same foreachBatch
    fold as live ingest)."""
    from hindex_spark.streaming.ingest import replay_changelog
    from hindex_spark.table import Table

    base = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    t = Table(base, "n_nationkey", "nation")
    tmp = tempfile.mkdtemp(prefix="hindex_wal_")
    # WAL order matters: key 991 is put then deleted LATER in the log —
    # with availableNow the whole log is one micro-batch, so only
    # seq-ordered replay gets this right (WALPlayer.java preserves order).
    spark.createDataFrame(
        [
            (1, "put", 991, "EPHEMERAL", 2),
            (2, "put", 990, "STREAMED", 1),
            (3, "delete", 991, None, None),
            (4, "delete", 3, None, None),
        ],
        "seq long, op string, n_nationkey long, n_name string, n_regionkey long",
    ).write.parquet(f"{tmp}/changelog")
    ingest = replay_changelog(
        spark, t, f"{tmp}/changelog",
        "seq long, op string, n_nationkey long, n_name string, n_regionkey long",
    )
    return ingest.table.df


@query(
    "streaming_windowed_agg",
    """SELECT epoch_us(ts) - (epoch_us(ts) % 3600000000) AS win_start_us,
              event_type,
              COUNT(*) AS n,
              ROUND(SUM(value), 2) AS total_value
       FROM events GROUP BY 1, 2""",
)
def q_streaming_windowed_agg(spark, sf_dir):
    """Watermarked windowed aggregation over the streaming ingest path
    (SURVEY §2.10 — additive beyond the reference, which ships CDC but
    no stream queries). Complete-mode memory sink with availableNow
    trigger: deterministic, equal to the batch aggregation."""
    import uuid

    from hindex_spark.streaming.ingest import (
        dir_bytes,
        state_scaled_partitions,
        windowed_event_counts,
    )

    src = tempfile.mkdtemp(prefix="hindex_winagg_") + "/events"
    spark.read.parquet(f"{sf_dir}/events.parquet").write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    from hindex_spark.timeutil import ts_timestamp

    stream = stream.withColumn("ts", ts_timestamp(stream))
    agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    qname = f"win_out_{uuid.uuid4().hex[:8]}"
    # state partitions sized to the stream's volume (state_scaled_partitions)
    with state_scaled_partitions(spark, dir_bytes(src)):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(qname)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.sql(f"SELECT * FROM {qname}").select(
        F.unix_micros("win_start").alias("win_start_us"),
        "event_type",
        "n",
        "total_value",
    )


@query(
    "etl_bulk_load",
    """SELECT o_orderkey, o_custkey FROM orders
       WHERE o_orderkey < 500 OR (o_orderkey >= 5000 AND o_orderkey < 5500)""",
)
def q_etl_bulk_load(spark, sf_dir):
    """LoadIncrementalHFiles (hbase-server/.../mapreduce/
    LoadIncrementalHFiles.java): move prepared files into the table dir.
    Stage a base table, bulk-load a prepared batch, read the table back —
    rows must be the union. The loaded dir is then COMPACTED
    (compact_table_files — the Store.compact analog): the oracle reading
    the post-compaction table proves the rewrite is content-preserving,
    and the file count must shrink."""
    import os

    src = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    tmp = tempfile.mkdtemp(prefix="hindex_bulk_")
    src.filter(F.col("o_orderkey") < 500).write.parquet(f"{tmp}/table")
    src.filter(
        (F.col("o_orderkey") >= 5000) & (F.col("o_orderkey") < 5500)
    ).write.parquet(f"{tmp}/prepared")
    jobs.bulk_load(spark, f"{tmp}/prepared", f"{tmp}/table")
    files_before = len(
        [f for f in os.listdir(f"{tmp}/table") if f.endswith(".parquet")]
    )
    jobs.compact_table_files(spark, f"{tmp}/table", "o_orderkey")
    files_after = len(
        [f for f in os.listdir(f"{tmp}/table") if f.endswith(".parquet")]
    )
    assert files_after < files_before, (files_before, files_after)
    return spark.read.parquet(f"{tmp}/table")


@query(
    "multi_table_scan",
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
       WHERE (o_orderkey >= 100 AND o_orderkey < 600)
          OR (o_orderkey >= 5000 AND o_orderkey < 5500)""",
)
def q_multi_table_scan(spark, sf_dir):
    """MultiTableInputFormat analog (SURVEY §2.1,
    hbase-server/.../mapreduce/MultiTableInputFormat.java): one job
    scanning several tables. Two rowkey-range restrictions of orders
    stand in for two tables; the scan is their unionByName."""
    from hindex_spark.catalog import multi_table_scan
    from hindex_spark.table import Table

    base = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    a = Table(base.filter((F.col("o_orderkey") >= 100) & (F.col("o_orderkey") < 600)),
              "o_orderkey", "orders_a")
    b = Table(base.filter((F.col("o_orderkey") >= 5000) & (F.col("o_orderkey") < 5500)),
              "o_orderkey", "orders_b")
    return multi_table_scan([a, b])


@query(
    "etl_import_tsv",
    "SELECT o_orderkey, o_custkey, o_orderstatus FROM orders",
)
def q_etl_import_tsv(spark, sf_dir):
    """Round-trip: table -> TSV dump -> import_tsv -> rows (must equal
    the source)."""
    src = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    tmp = tempfile.mkdtemp(prefix="hindex_tsv_")
    path = f"{tmp}/orders_tsv"
    src.write.option("sep", "\t").mode("overwrite").csv(path)
    return jobs.import_tsv(
        spark,
        path,
        ["o_orderkey", "o_custkey", "o_orderstatus"],
        "o_orderkey",
        schema="o_orderkey long, o_custkey long, o_orderstatus string",
    )


@query(
    "etl_import_tsv_cells",
    """WITH src AS (SELECT CAST(user_id AS VARCHAR) AS rk, epoch_us(ts) AS t,
                          event_type, printf('%.2f', value) AS v
                   FROM events)
       SELECT rk AS rowkey, 'e' AS cf, 'type' AS qualifier, t AS ts,
              event_type AS value FROM src
       UNION ALL
       SELECT rk, 'e', 'val', t, v FROM src""",
)
def q_etl_import_tsv_cells(spark, sf_dir):
    """ImportTsv with the reference's HBASE_ROW_KEY/HBASE_TS_KEY column
    spec into the versioned CELL layer (TsvParser semantics,
    TestIndexImportTsv testTsvParserWithTimestamp): round-trips events
    through a TSV dump, each line's ts field becoming the timestamp of
    both its cells."""
    from hindex_spark.timeutil import ts_micros

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = ev.select(
        F.col("user_id").cast("string"),
        ts_micros(ev).alias("t"),
        "event_type",
        F.format_string("%.2f", "value").alias("v"),
    )
    tmp = tempfile.mkdtemp(prefix="hindex_tsv_cells_")
    path = f"{tmp}/events_tsv"
    src.write.option("sep", "\t").mode("overwrite").csv(path)
    return jobs.import_tsv_cells(
        spark, path, ["HBASE_ROW_KEY", "HBASE_TS_KEY", "e:type", "e:val"]
    ).select("rowkey", "cf", "qualifier", "ts", "value")


@query(
    "streaming_replication_roundtrip",
    """SELECT n_nationkey,
              CASE WHEN n_nationkey = 7 THEN 'UPDATED' ELSE n_name END AS n_name,
              CASE WHEN n_nationkey = 7 THEN n_regionkey + 10
                   ELSE n_regionkey END AS n_regionkey
       FROM nation WHERE n_nationkey <> 3
       UNION ALL
       SELECT 990 AS n_nationkey, 'REBORN' AS n_name, 2 AS n_regionkey""",
)
def q_streaming_replication_roundtrip(spark, sf_dir):
    """Replication round-trip — emit side (WAL shipping,
    hbase-server/.../replication/) + replay side (WALPlayer): a source
    table with a changelog enabled takes put / delete / put-after-delete
    / increment mutations; a PEER starting from the same snapshot
    replays the shipped log and must reach the identical state. The
    put-delete-put on key 990 only survives with cross-batch seq order;
    the increment round-trips through its CDC after-image."""
    from hindex_spark.streaming.ingest import replay_changelog
    from hindex_spark.table import Table

    base = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    log_dir = tempfile.mkdtemp(prefix="hindex_repl_") + "/changelog"
    src = Table(base, "n_nationkey", "nation").enable_changelog(log_dir)
    src = src.put(
        spark.createDataFrame(
            [(7, "UPDATED"), (990, "STREAMED")], "n_nationkey long, n_name string"
        )
    )
    src = src.delete(
        spark.createDataFrame([(3,), (990,)], "n_nationkey long")
    )
    src = src.put(
        spark.createDataFrame(
            [(990, "REBORN", 2)], "n_nationkey long, n_name string, n_regionkey long"
        )
    )
    src = src.increment(
        spark.createDataFrame([(7, 10)], "n_nationkey long, n_regionkey long")
    )

    peer = Table(base, "n_nationkey", "nation_peer")
    ingest = replay_changelog(spark, peer, log_dir, src.changelog_schema)
    replica = ingest.table.df.select("n_nationkey", "n_name", "n_regionkey")
    # the gate's oracle checks the replica; the emit side is validated by
    # the replica EQUALLING the mutated source (exceptAll both ways)
    src_final = src.df.select("n_nationkey", "n_name", "n_regionkey")
    assert replica.exceptAll(src_final).isEmpty()
    assert src_final.exceptAll(replica).isEmpty()
    return replica


@query(
    "streaming_changelog_resume",
    """SELECT n_nationkey,
              CASE WHEN n_nationkey = 7 THEN 'UPDATED' ELSE n_name END AS n_name,
              CASE WHEN n_nationkey = 7 THEN n_regionkey + 10
                   ELSE n_regionkey END AS n_regionkey
       FROM nation
       UNION ALL
       SELECT 990 AS n_nationkey, 'KEEP' AS n_name, 1 AS n_regionkey""",
)
def q_streaming_changelog_resume(spark, sf_dir):
    """Changelog durability across emitter re-attach + log compaction
    (reference: WAL sequence ids are PERSISTENT —
    hbase-server/.../regionserver/wal/FSHLog.java — and survive
    region-server restarts; TestIndexPutsWithRegionServerRestart proves
    edits ordered across the restart).

    A source table emits puts, the process "restarts" (a NEW Table
    re-attaches a fresh emitter to the same log path), then emits a
    delete of a pre-restart key. The re-attached emitter must RESUME seq
    from the existing log: if it re-numbered from 1, replay — which
    orders by seq — would apply the post-restart delete of key 991
    BEFORE its pre-restart put, and 991 would wrongly survive on the
    peer. The log is then compacted (tiny per-batch files -> one
    seq-sorted file) and replayed; the replica must equal the source."""
    import os

    from hindex_spark.streaming.ingest import compact_changelog, replay_changelog
    from hindex_spark.table import Table

    base = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    log_dir = tempfile.mkdtemp(prefix="hindex_resume_") + "/changelog"
    src = Table(base, "n_nationkey", "nation").enable_changelog(log_dir)
    # pre-restart: two new keys (seq 1, 2)
    src = src.put(
        spark.createDataFrame(
            [(990, "KEEP", 1), (991, "DOOMED", 2)],
            "n_nationkey long, n_name string, n_regionkey long",
        )
    )
    src = src.put(
        spark.createDataFrame([(7, "UPDATED")], "n_nationkey long, n_name string")
    )
    # "restart": a new Table object over the current state re-attaches a
    # FRESH emitter to the same log path (seq counter starts unseeded)
    src2 = Table(src.df, "n_nationkey", "nation").enable_changelog(log_dir)
    src2 = src2.delete(spark.createDataFrame([(991,)], "n_nationkey long"))
    src2 = src2.increment(
        spark.createDataFrame([(7, 10)], "n_nationkey long, n_regionkey long")
    )
    # the re-attached emitter resumed: 2 pre-restart batches -> post-
    # restart emits are seq 3 and 4, not 1 and 2
    assert src2._changelog.seq == 4, f"seq not resumed: {src2._changelog.seq}"
    files_before = len([f for f in os.listdir(log_dir) if f.endswith(".parquet")])
    files_after = compact_changelog(spark, log_dir, num_files=1)
    assert files_after < files_before, (files_before, files_after)
    peer = Table(base, "n_nationkey", "nation_peer")
    ingest = replay_changelog(spark, peer, log_dir, src2.changelog_schema)
    replica = ingest.table.df.select("n_nationkey", "n_name", "n_regionkey")
    src_final = src2.df.select("n_nationkey", "n_name", "n_regionkey")
    assert replica.exceptAll(src_final).isEmpty()
    assert src_final.exceptAll(replica).isEmpty()
    return replica


@query(
    "etl_verify_replication",
    """WITH peer AS (
         SELECT n_nationkey,
                CASE WHEN n_nationkey = 7 THEN 'TAMPERED' ELSE n_name END AS n_name,
                n_regionkey
         FROM nation WHERE n_nationkey <> 3
         UNION ALL SELECT 990 AS n_nationkey, 'GHOST' AS n_name, 0 AS n_regionkey
       ),
       j AS (
         SELECT s.n_nationkey AS sk, p.n_nationkey AS pk,
                (s.n_name = p.n_name AND s.n_regionkey = p.n_regionkey) AS same
         FROM nation s FULL OUTER JOIN peer p ON s.n_nationkey = p.n_nationkey
       )
       SELECT
         COUNT(CASE WHEN sk IS NOT NULL AND pk IS NOT NULL AND same THEN 1 END) AS goodrows,
         COUNT(CASE WHEN NOT (sk IS NOT NULL AND pk IS NOT NULL AND same) THEN 1 END) AS badrows,
         COUNT(CASE WHEN pk IS NULL THEN 1 END) AS only_in_source,
         COUNT(CASE WHEN sk IS NULL THEN 1 END) AS only_in_peer,
         COUNT(CASE WHEN sk IS NOT NULL AND pk IS NOT NULL AND NOT same THEN 1 END) AS content_different
       FROM j""",
)
def q_etl_verify_replication(spark, sf_dir):
    """VerifyReplication ("verifyrep") — the reference Driver's 8th and
    last tool (mapreduce/replication/VerifyReplication.java:80-133):
    compare source vs peer, count GOODROWS/BADROWS. The peer fixture
    diverges three ways from the source: one content tamper (key 7),
    one lost edit (key 3 missing on the peer), one ghost row (990 only
    on the peer) — exercising all three badrow causes."""
    src = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    peer = src.filter(F.col("n_nationkey") != 3).withColumn(
        "n_name",
        F.when(F.col("n_nationkey") == 7, F.lit("TAMPERED")).otherwise(F.col("n_name")),
    )
    ghost = spark.createDataFrame(
        [(990, "GHOST", 0)], "n_nationkey long, n_name string, n_regionkey long"
    )
    peer = peer.unionByName(ghost)
    return jobs.verify_replication(src, peer, "n_nationkey")


@query(
    "etl_import_jsonl",
    """SELECT doc_id, text, lang, source, n_chars
       FROM documents WHERE text IS NOT NULL""",
)
def q_etl_import_jsonl(spark, sf_dir):
    """JSON-lines ingest round trip (etl/jobs.py:import_jsonl — the
    web-crawl sibling of ImportTsv, same BadLine taxonomy): documents
    written as JSONL, re-ingested under an explicit schema with the
    permissive corrupt-record channel, quarantine empty, typed rows
    identical to the source. Corrupt-line handling (NULL+_corrupt /
    drop / abort) is pinned in tests/test_etl_and_dsl.py."""
    import tempfile

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    path = tempfile.mkdtemp(prefix="hindex_jsonl_") + "/docs"
    docs.write.mode("overwrite").json(path)
    got = jobs.import_jsonl(
        spark, path,
        "doc_id long, text string, lang string, source string, n_chars long",
        "doc_id",
    )
    # quarantine must be empty on a clean dump — surface any damage as
    # a gate error rather than silently dropping it from the compare.
    # (Persisted first: Spark refuses queries over a raw JSON source
    # whose pruned projection is ONLY the internal corrupt-record
    # column, and count() prunes every data column away.)
    got = got.persist()
    assert got.filter(F.col("_corrupt").isNotNull()).count() == 0
    return got.drop("_corrupt")


@query(
    "etl_table_diff",
    """WITH o AS (SELECT * FROM orders WHERE o_orderkey % 5 <> 0),
       n AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                    CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2
                         ELSE o_totalprice END AS o_totalprice,
                    o_orderdate,
                    CASE WHEN o_orderkey % 11 = 0 THEN 'X'
                         ELSE o_orderpriority END AS o_orderpriority
             FROM orders WHERE o_orderkey % 7 <> 0)
       SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
              CASE WHEN o.o_orderkey IS NULL THEN 'added'
                   WHEN n.o_orderkey IS NULL THEN 'removed'
                   ELSE 'changed' END AS change,
              CASE WHEN o.o_orderkey IS NULL OR n.o_orderkey IS NULL
                   THEN ''
                   ELSE concat_ws(',',
                     CASE WHEN o.o_custkey IS DISTINCT FROM n.o_custkey
                          THEN 'o_custkey' END,
                     CASE WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                          THEN 'o_orderstatus' END,
                     CASE WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
                          THEN 'o_totalprice' END,
                     CASE WHEN o.o_orderdate IS DISTINCT FROM n.o_orderdate
                          THEN 'o_orderdate' END,
                     CASE WHEN o.o_orderpriority IS DISTINCT FROM n.o_orderpriority
                          THEN 'o_orderpriority' END)
              END AS changed_cols
       FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey
       WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
          OR o.o_custkey IS DISTINCT FROM n.o_custkey
          OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
          OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
          OR o.o_orderdate IS DISTINCT FROM n.o_orderdate
          OR o.o_orderpriority IS DISTINCT FROM n.o_orderpriority""",
)
def q_etl_table_diff(spark, sf_dir):
    """Row-level table diff (etl/jobs.py:diff_tables): which keys were
    added/removed and which columns changed, per row — the audit detail
    behind verify_replication's counters (VerifyReplication.java:80-133
    reports counts; a migration review needs the rows). The fixture
    diverges three ways: keys %5==0 added, keys %7==0 removed, and two
    independent column tampers (%3 doubles o_totalprice, %11 rewrites
    o_orderpriority) so single- and multi-column attribution both
    occur."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    )
    old = orders.filter(F.col("o_orderkey") % 5 != 0)
    new = orders.filter(F.col("o_orderkey") % 7 != 0).withColumns({
        "o_totalprice": F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") * 2
        ).otherwise(F.col("o_totalprice")),
        "o_orderpriority": F.when(
            F.col("o_orderkey") % 11 == 0, F.lit("X")
        ).otherwise(F.col("o_orderpriority")),
    })
    return jobs.diff_tables(old, new, ["o_orderkey"])


@query(
    "cells_cell_counter",
    """WITH cells AS (
         SELECT CAST(user_id AS VARCHAR) AS rowkey,
                CASE WHEN event_type IN ('click','view') THEN 'web'
                     ELSE 'act' END AS cf,
                event_type AS qualifier
         FROM events
       ),
       v AS (SELECT rowkey, cf, qualifier, COUNT(*) AS cnt
             FROM cells GROUP BY rowkey, cf, qualifier),
       rf AS (SELECT DISTINCT rowkey, cf FROM v)
       SELECT 'Total ROWS' AS key, COUNT(DISTINCT rowkey) AS cnt FROM v
       UNION ALL
       SELECT 'Total Families Across all Rows', COUNT(*) FROM rf
       UNION ALL
       SELECT cf, COUNT(*) FROM rf GROUP BY cf
       UNION ALL
       SELECT 'Total Qualifiers across all Rows', COUNT(*) FROM v
       UNION ALL
       SELECT cf || ':' || qualifier, COUNT(*) FROM v GROUP BY cf, qualifier
       UNION ALL
       SELECT rowkey || ':' || cf || ':' || qualifier || '_Versions', cnt FROM v""",
)
def q_cells_cell_counter(spark, sf_dir):
    """CellCounter's full six-stat report over the versioned cell layer
    (CellCounter.java:55-170) — the wide-layer etl_cell_counter gate
    covers the tool CLI shape; this one covers the reference's actual
    per-family / per-qualifier / versions-per-cell report on a
    two-family cell fixture derived from events."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cells = ev.select(
        F.col("user_id").cast("string").alias("rowkey"),
        F.when(F.col("event_type").isin("click", "view"), F.lit("web"))
        .otherwise(F.lit("act"))
        .alias("cf"),
        F.col("event_type").alias("qualifier"),
    )
    return jobs.cell_counter_report(cells)


@query(
    "streaming_interval_join",
    """SELECT c.user_id,
              COUNT(*) AS n_attributed,
              ROUND(SUM(p.value), 2) AS attributed_value
       FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c
       JOIN (SELECT user_id, ts, value FROM events
             WHERE event_type = 'purchase') p
         ON p.user_id = c.user_id
        AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
       GROUP BY c.user_id""",
)
def q_streaming_interval_join(spark, sf_dir):
    """Stream-stream interval join (attribution: purchases within one
    hour after a click, per user) — watermarked on both sides so join
    state is bounded by the watermark window, not the stream. Inner
    matches emit in the batch they are found, so the availableNow run
    equals the batch join (the oracle)."""
    import uuid

    from hindex_spark.streaming.ingest import (
        dir_bytes,
        state_scaled_partitions,
        stream_interval_join,
    )
    from hindex_spark.timeutil import ts_timestamp

    src = tempfile.mkdtemp(prefix="hindex_ssjoin_") + "/events"
    spark.read.parquet(f"{sf_dir}/events.parquet").write.parquet(src)
    schema = spark.read.parquet(src).schema

    def _side(event_type, ts_name, cols):
        s = spark.readStream.schema(schema).parquet(src)
        s = s.withColumn("__t", ts_timestamp(s)).filter(
            F.col("event_type") == event_type
        )
        return s.select(*cols, F.col("__t").alias(ts_name))

    clicks = _side("click", "c_ts", [F.col("user_id").alias("c_user")])
    purchases = _side("purchase", "p_ts", [F.col("user_id").alias("p_user"), "value"])
    joined = stream_interval_join(
        clicks,
        purchases,
        F.col("p_user") == F.col("c_user"),
        "c_ts",
        "p_ts",
        3600,
        watermark="2 hours",
    )
    qname = f"ssj_out_{uuid.uuid4().hex[:8]}"
    # state partitions sized to the stream's volume, not the session's
    # shuffle width (a stream-stream join commits FOUR state stores per
    # partition per batch — see state_scaled_partitions)
    with state_scaled_partitions(spark, dir_bytes(src)):
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(qname)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.sql(f"SELECT * FROM {qname}")
        .groupBy(F.col("c_user").alias("user_id"))
        .agg(
            F.count("*").alias("n_attributed"),
            F.round(F.sum("value"), 2).alias("attributed_value"),
        )
    )


@query(
    "streaming_session_window",
    """WITH l AS (SELECT user_id, ts, value,
                  CASE WHEN lag(ts) OVER w IS NULL
                        OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                       THEN 1 ELSE 0 END AS brk
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        s AS (SELECT user_id, ts, value,
                  SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
              FROM l)
       SELECT epoch_us(MIN(ts)) AS sess_start_us,
              epoch_us(MAX(ts) + INTERVAL 30 MINUTE) AS sess_end_us,
              user_id,
              COUNT(*) AS n,
              ROUND(SUM(value), 2) AS total_value
       FROM s GROUP BY user_id, sid""",
)
def q_streaming_session_window(spark, sf_dir):
    """Native streaming session windows (F.session_window): sessions
    close after a 30-minute gap; window end = last event + gap — the
    same islands the batch SQL oracle derives with lag()+running-sum.
    Complete-mode memory sink with availableNow: deterministic."""
    import uuid

    from hindex_spark.streaming.ingest import (
        dir_bytes,
        session_window_counts,
        state_scaled_partitions,
    )
    from hindex_spark.timeutil import ts_timestamp

    src = tempfile.mkdtemp(prefix="hindex_sesswin_") + "/events"
    spark.read.parquet(f"{sf_dir}/events.parquet").write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    stream = stream.withColumn("ts", ts_timestamp(stream))
    agg = session_window_counts(stream, gap="30 minutes")
    qname = f"sess_out_{uuid.uuid4().hex[:8]}"
    # state partitions sized to the stream's volume (state_scaled_partitions)
    with state_scaled_partitions(spark, dir_bytes(src)):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(qname)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.sql(f"SELECT * FROM {qname}").select(
        F.unix_micros("sess_start").alias("sess_start_us"),
        F.unix_micros("sess_end").alias("sess_end_us"),
        "user_id",
        "n",
        "total_value",
    )
