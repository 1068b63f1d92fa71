"""Property test for the artifact tombstone machinery
(operators/artifact.py): arbitrary interleavings of
update / upsert / delete / compact against a SearchIndex must leave the
LIVE doc set — and each live doc's text version — exactly equal to a
trivial dict model. Catches generation-arithmetic and cut-boundary
mistakes (a tombstone killing its own generation, a compact losing
gens, a reload miss) that single-scenario tests can overlook."""

import os

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hindex_spark.catalog import Catalog
from hindex_spark.operators.search import SearchIndex

import pytest

pytestmark = pytest.mark.slow  # property/fuzz/chaos tier: run explicitly with -m slow (see pytest.ini)

#: tiny id universe so ops collide a lot (that's where the bugs live)
IDS = list(range(6))

#: an op is (verb, ids, version-salt)
op_st = st.tuples(
    st.sampled_from(["update", "upsert", "delete", "compact"]),
    st.lists(st.sampled_from(IDS), min_size=1, max_size=3, unique=True),
    st.integers(min_value=0, max_value=9),
)


def _text(doc_id: int, salt: int) -> str:
    return f"doc {doc_id} revision v{salt} shared filler words"


@settings(
    # CI default 10 keeps the suite fast; deep runs set
    # HX_PROP_EXAMPLES=100+ (each example is several Spark jobs)
    max_examples=int(os.environ.get("HX_PROP_EXAMPLES", "10")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
# round-8-found counterexample, pinned so it replays on every machine
# (hypothesis's example database is local): delete EVERY live doc, then
# compact — the purged store has zero parquet files and the doclen
# rebuild's re-read used to die with UNABLE_TO_INFER_SCHEMA; the
# _schema.ddl sidecar now pins the re-read's schema.
@example(ops=[("delete", [0, 1, 2], 0), ("compact", [0], 0)])
@given(st.lists(op_st, min_size=1, max_size=5))
def test_tombstone_interleavings_match_dict_model(spark, tmp_path_factory, ops):
    tmp = tmp_path_factory.mktemp("artprop")
    cat = Catalog(spark, str(tmp / "wh"))
    seed = [(i, _text(i, 99)) for i in IDS[:3]]
    ix = SearchIndex.build(
        cat,
        spark.createDataFrame(seed, "doc_id long, text string"),
        "doc_id", "text", "prop",
    )
    model = {i: t for i, t in seed}

    for verb, ids, salt in ops:
        if verb == "compact":
            ix.compact()
            continue
        frame = spark.createDataFrame(
            [(i, _text(i, salt)) for i in ids], "doc_id long, text string"
        )
        if verb == "update":
            # contract: update() assumes NEW ids — only exercise it that
            # way (the model would otherwise diverge by design)
            fresh = [i for i in ids if i not in model]
            if not fresh:
                continue
            frame = frame.filter(F.col("doc_id").isin(fresh))
            ix.update(frame)
            for i in fresh:
                model[i] = _text(i, salt)
        elif verb == "upsert":
            ix.upsert(frame)
            for i in ids:
                model[i] = _text(i, salt)
        elif verb == "delete":
            ix.delete(frame.select("doc_id"))
            for i in ids:
                model.pop(i, None)

    # live docs and their version-marker token must match the model:
    # each doc's text carries exactly one v<salt> token, so the live
    # posting for "v<salt>" identifies the surviving version
    live = {
        r["doc_id"]: r["token"]
        for r in ix.postings.filter(F.col("token").rlike("^v[0-9]+$"))
        .select("doc_id", "token").collect()
    }
    want = {i: t.split()[3] for i, t in model.items()}
    assert live == want
    # incremental stats always reconcile with a recompute
    n, s = ix.n_docs, ix.sum_dl
    ix.repair_stats()
    assert (n, s) == (ix.n_docs, ix.sum_dl)
