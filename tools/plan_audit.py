"""Plan lint: audit the physical plan of EVERY registered query for
scale-killing patterns, without executing the data path.

The manual "plan audit of the top-N expensive queries" from earlier
rounds, automated over the whole surface. Runs each queries() entry at
the given sf_dir (default sf0.001: plans are identical across SF for
lint purposes, queries whose setup executes mutations stay cheap) and
inspects the PLANNED physical tree of the returned DataFrame for:

  * CartesianProduct            — forbidden everywhere (an all-pairs
                                  expansion can never ship at 100 TB)
  * BatchEvalPython             — row-at-a-time Python in the plan;
                                  forbidden everywhere
  * ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas
                                — Arrow-batched Python; sanctioned ONLY
                                  for the multimodal decode edge
  * exchange_count              — reported (not failed) so a diff of two
                                  audits shows shuffle regressions

Exit 0 when no forbidden pattern appears outside the allowlist; exit 1
otherwise. Prints one JSON object; drop it next to BENCH/CORRECTNESS
artifacts to make plan regressions diffable round over round.

Usage: python tools/plan_audit.py [sf_dir] [--out PLAN_AUDIT.json]
"""

import json
import re
import sys

# Arrow-batched Python edges that are the POINT of the operator, not an
# accident: multimodal decode (no media libs JVM-side), the
# coprocessor-endpoint surface (SURVEY §2.11 maps Endpoint -> mapInPandas
# by design — arbitrary distributed computation is its contract), and
# the round-13 DSIR/LM scoring kernel (guide §4.2: no native gather-sum
# expression exists; the vectorized numpy gather over the collected
# bounded fit table replaced an interpreted per-gram aggregate fold,
# measured 4.7x on the score stage with bit-identical weights).
# Everything else must stay in codegen.
ARROW_ALLOWED = {
    "multimodal_features",
    "multimodal_blob_stats",
    "multimodal_resize",
    "multimodal_frames",
    "multimodal_audio_stats",
    "multimodal_audio_windows",
    "multimodal_audio_resample",
    "multimodal_video_stats",
    "multimodal_video_frames",
    "multimodal_gif_frames",
    "multimodal_gif_stats",
    "multimodal_audio_g711",
    "coproc_row_count",
    # DSIR importance / LM cross-entropy scoring (ArrowEvalPython
    # projection; operators/importance.py)
    "corpus_dsir_weights",
    "corpus_dsir_select",
    "corpus_perplexity",
    "corpus_perplexity_split",
    "corpus_pipeline_dsir",
}

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")
ARROW_NODES = ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")


def audit(plan: str) -> dict:
    return {
        "cartesian": "CartesianProduct" in plan,
        "row_python": "BatchEvalPython" in plan,
        "arrow_python": any(n in plan for n in ARROW_NODES),
        "exchange_count": len(re.findall(r"\bExchange\b", plan)),
        "bnl_join": "BroadcastNestedLoopJoin" in plan,
    }


def main():
    argv, out_path, args = sys.argv[1:], None, []
    i = 0
    while i < len(argv):
        if argv[i] == "--out":
            out_path = argv[i + 1]
            i += 2
        else:
            args.append(argv[i])
            i += 1
    sf_dir = args[0] if args else "/root/testdata/sf0.001"

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry
    from hindex_spark.session import get_spark

    spark = get_spark("plan_audit")
    results, failures = {}, []
    for name, fn in entry.queries().items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            rec = audit(plan)
        except Exception as e:  # noqa: BLE001 - lint must cover the rest
            rec = {"error": str(e)[:200]}
            failures.append(name)
            results[name] = rec
            continue
        bad = []
        if rec["cartesian"]:
            bad.append("CartesianProduct")
        if rec["row_python"]:
            bad.append("BatchEvalPython")
        if rec["arrow_python"] and name not in ARROW_ALLOWED:
            bad.append("unsanctioned-arrow-python")
        rec["violations"] = bad
        if bad:
            failures.append(name)
        results[name] = rec

    summary = {
        "queries": len(results),
        "clean": len(results) - len(failures),
        "flagged": sorted(failures),
        "results": results,
    }
    line = json.dumps(summary)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")
    print(json.dumps({k: summary[k] for k in ("queries", "clean", "flagged")}))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
