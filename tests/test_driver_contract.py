"""Driver-contract guard: __spark_entry__ must work with a VANILLA
SparkSession (the driver builds its own, without our session configs —
notably without nanosAsLong and possibly a non-UTC timezone)."""

import subprocess
import sys

SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .appName("vanilla_driver")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "America/New_York")  # hostile TZ
    .getOrCreate()
)
import __spark_entry__ as e

df = e.entry(spark)
assert df.count() > 0, "entry() returned no rows"

qs = e.queries()
oracles = e.oracle_sql()
missing = [k for k in oracles if k not in qs]
assert not missing, f"oracle without query: {missing}"

# the events-reading queries are the ones that need session-conf repair
for name in ["filter_isin", "cells_latest_version", "mutation_put_upsert", "tpch_q1",
             "corpus_pipeline_e2e", "coproc_bulk_delete", "mutation_batch_status",
             "sim_ivf_ann_topk", "events_salted_join",
             # round-4 additions: replication roundtrip (streams +
             # timestamps), combination planner gates, quality-ranked dedup
             "streaming_replication_roundtrip", "idxtab_complex_range_or",
             "idxtab_negative_double_le", "corpus_clean_best",
             "multimodal_features"]:
    out = qs[name](spark, "/root/testdata/sf0.001")
    n = len(out.collect())
    assert n >= 0
    print(f"{name}: {n} rows", flush=True)
print("CONTRACT_OK")
"""


def test_entry_contract_with_vanilla_session():
    r = subprocess.run(
        [sys.executable, "-c", SCRIPT], capture_output=True, text=True, timeout=420
    )
    assert "CONTRACT_OK" in r.stdout, f"stdout={r.stdout[-2000:]}\nstderr={r.stderr[-3000:]}"
