"""Z-order layout (operators/layout.py): Morton key correctness vs a
Python bit-interleave model, clustering effect on real files, content
preservation, and the argument guards."""

import pytest
from pyspark.sql import functions as F

from hindex_spark.operators.layout import (
    MAX_QUANTILE_BITS,
    zorder_frame,
    zorder_key,
)


def _morton(vals, bits):
    z = 0
    nd = len(vals)
    for d, v in enumerate(vals):
        for i in range(bits):
            z |= ((v >> i) & 1) << (i * nd + d)
    return z


def test_zorder_key_matches_python_model(spark):
    # linear quantize over exact 0..15 grids: bucket == value
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select(
        "x", "y", zorder_key(df, ["x", "y"], bits=4, quantize="linear")
        .alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _morton((r["x"], r["y"]), 4), (r["x"], r["y"])


def test_zorder_layout_clusters_and_preserves(spark, tmp_path):
    rows = [(i, i % 50, float(i)) for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, k long, v double")
    out = str(tmp_path / "z")
    zorder_frame(df, ["k", "v"], num_partitions=16).write.parquet(out)
    back = spark.read.parquet(out)
    assert back.exceptAll(df).count() == 0
    assert df.exceptAll(back).count() == 0
    touched = (
        back.filter(F.col("k") == 7)
        .select(F.input_file_name().alias("f")).distinct().count()
    )
    total = back.select(F.input_file_name().alias("f")).distinct().count()
    # k=7 rows are 2% of the data; a clustered layout confines them to
    # a small corner of the files (an unclustered one hits ~all)
    assert total >= 8 and touched <= total // 2


def test_zorder_timestamp_dimension(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").limit(500)
    z = zorder_frame(ev, ["user_id", "ts"], num_partitions=4)
    assert z.count() == 500 and set(z.columns) == set(ev.columns)


def test_zorder_guards(spark):
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(ValueError, match="> 62"):
        zorder_key(df, ["x", "y"], bits=32)
    with pytest.raises(ValueError, match="at least one column"):
        zorder_key(df, [])
    with pytest.raises(ValueError, match="unknown quantize"):
        zorder_key(df, ["x"], quantize="nope")
    with pytest.raises(ValueError, match=f"<= {MAX_QUANTILE_BITS}"):
        zorder_key(df, ["x"], bits=12, quantize="quantile")


def test_zorder_constant_and_null_columns(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, None)], "x long, y string"
    ).select("x", F.col("y").cast("long").alias("y"))
    # constant/null dimensions quantize to bucket 0 instead of failing
    assert zorder_frame(df, ["x", "y"], num_partitions=1).count() == 3


def test_murmur3_long_matches_spark_hash(spark):
    # _hash_partition_reps' identity routing relies on reproducing
    # Spark's Murmur3 long hash exactly — pin the emulation to F.hash
    from hindex_spark.operators.layout import _murmur3_hash_long

    vals = list(range(40)) + [2**40 + 7, -5, 123456789012345, -(2**62)]
    rows = (
        spark.createDataFrame([(v,) for v in vals], "v long")
        .select("v", F.hash("v").alias("h"))
        .collect()
    )
    for r in rows:
        assert _murmur3_hash_long(r["v"]) == r["h"], r["v"]


def test_zorder_partitions_cover_disjoint_ordered_ranges(spark, tmp_path):
    # quantile mode's hash-representative exchange must place Morton
    # bin i in partition i: every output file then covers a contiguous
    # zkey range disjoint from (and ordered against) every other file —
    # the repartitionByRange guarantee, without its sampling pass
    from hindex_spark.operators.layout import (
        _hash_partition_reps,
        _murmur3_hash_long,
    )

    n = 16
    reps = _hash_partition_reps(n)
    assert len(set(reps)) == n
    for i, v in enumerate(reps):
        assert _murmur3_hash_long(v) % n == i

    # one dimension: the Morton key IS the bucket id, monotone in k
    # whatever the cuts are — so identity routing implies per-file
    # [min(k), max(k)] spans that are strictly disjoint and ordered
    rows = [(i, (i * 37) % 1000) for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, k long")
    out = str(tmp_path / "zr")
    zorder_frame(df, ["k"], num_partitions=n).write.parquet(out)
    back = spark.read.parquet(out)
    per_file = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
        .collect()
    )
    spans = sorted((r["lo"], r["hi"]) for r in per_file)
    assert len(spans) >= 4
    for (_lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2, spans
