"""The migration story in one test: everything a user of the reference
does daily — create an indexed table, bulk-load TSV, mutate (put/delete/
increment/checkAnd), scan with DSL filters and index hints, aggregate,
export — through this engine's API."""

from pyspark.sql import functions as F

from hindex_spark import (
    Catalog,
    IndexSpecification,
    NoIndexExpression,
    Scan,
    Table,
    parse_filter,
)
from hindex_spark import aggregations as agg
from hindex_spark.etl import jobs


def test_full_user_journey(spark, sf_dir, tmp_path):
    # 1. ImportTsv bulk load (ImportTsv.java analog)
    src = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    tsv = str(tmp_path / "load_tsv")
    src.write.option("sep", "\t").mode("overwrite").csv(tsv)
    df = jobs.import_tsv(
        spark,
        tsv,
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"],
        "o_orderkey",
        schema="o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double",
    )

    # 2. create table + secondary index (IndexMasterObserver / TableIndexer)
    t = Table(df, "o_orderkey", "orders_j")
    t.create_index(IndexSpecification("idx_cust").add_column("o_custkey", "Long"))

    # 3. scan with the filter DSL; planner picks the index
    f = parse_filter("SingleColumnValueFilter('o_custkey', =, 'binary:85', 1)")
    hits = t.scan(Scan(filter=f)).collect()
    assert t.last_index_plan.used_indexes == ["idx_cust"]
    assert hits and all(r["o_custkey"] == 85 for r in hits)

    # 4. the same scan with NoIndexExpression (hint opt-out)
    plain = t.scan(Scan(filter=f, index_hint=NoIndexExpression()))
    assert not t.last_index_plan.uses_index
    assert plain.count() == len(hits)

    # 5. mutations: put, increment-and-get, checkAndPut, delete
    t = t.put(spark.createDataFrame([(1, 999)], ["o_orderkey", "o_custkey"]))
    t, result = t.increment_and_get(
        spark.createDataFrame([(1, 100.0)], ["o_orderkey", "o_totalprice"])
    )
    new_val = result.collect()[0]["o_totalprice"]
    t = t.check_and_put(
        "o_custkey",
        "=",
        999,
        spark.createDataFrame([(1, "P")], ["o_orderkey", "o_orderstatus"]),
    )
    t = t.delete(spark.createDataFrame([(2,)], ["o_orderkey"]))

    row1 = t.df.filter(F.col("o_orderkey") == 1).collect()[0]
    assert row1["o_custkey"] == 999
    assert row1["o_totalprice"] == new_val
    assert row1["o_orderstatus"] == "P"
    assert t.df.filter(F.col("o_orderkey") == 2).count() == 0
    # index tracked every mutation
    idx = t.index_tables["idx_cust"]
    assert idx.filter((F.col("o_custkey") == 999) & (F.col("o_orderkey") == 1)).count() == 1
    assert idx.filter(F.col("o_orderkey") == 2).count() == 0

    # 6. aggregation verbs over a scan scope
    s = agg.agg_sum(t, "o_totalprice", Scan(start_row=0, stop_row=1000))
    assert s and s > 0
    assert agg.agg_median(t, "o_totalprice") is not None

    # 7. persist with the catalog; reload and query through the index
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.save(t, num_partitions=4)
    t2 = cat.load("orders_j")
    out = t2.scan(Scan(filter=f))
    assert t2.last_index_plan.used_indexes == ["idx_cust"]
    assert out.filter(F.col("o_custkey") == 85).count() == out.count()

    # 8. export (Export.java analog)
    dump = str(tmp_path / "dump")
    jobs.export_table(t2.df, dump)
    assert jobs.import_table(spark, dump).count() == t2.df.count()


def test_coprocessor_service_and_endpoints(spark, sf_dir):
    import pandas as pd
    from pyspark.sql import functions as F

    from hindex_spark.coprocessor import (
        bulk_delete_endpoint,
        coprocessor_service,
        row_count_endpoint,
    )
    from hindex_spark.index.spec import IndexSpecification
    from hindex_spark.table import Scan, Table

    t = Table.from_parquet(spark, f"{sf_dir}/orders.parquet", "o_orderkey", "orders")
    # generic service: per-partition min/max (an arbitrary computation)
    def service(batches):
        for pdf in batches:
            if len(pdf):
                yield pd.DataFrame(
                    {"lo": [int(pdf["o_orderkey"].min())], "hi": [int(pdf["o_orderkey"].max())]}
                )

    parts = coprocessor_service(t, service, "lo long, hi long")
    row = parts.agg(F.min("lo").alias("lo"), F.max("hi").alias("hi")).collect()[0]
    exact = t.df.agg(F.min("o_orderkey"), F.max("o_orderkey")).collect()[0]
    assert (row["lo"], row["hi"]) == (exact[0], exact[1])

    # row count endpoint == count, scan-scoped
    scan = Scan(start_row=0, stop_row=500)
    assert row_count_endpoint(t, scan) == t.scan(scan).count()

    # bulk delete maintains indexes in the same batch
    t.create_index(IndexSpecification("idx_cust").add_column("o_custkey", "Long"))
    t2, n = bulk_delete_endpoint(t, predicate=F.col("o_custkey") == 85)
    assert n > 0
    assert t2.df.filter(F.col("o_custkey") == 85).count() == 0
    assert t2.index_tables["idx_cust"].filter(F.col("o_custkey") == 85).count() == 0
