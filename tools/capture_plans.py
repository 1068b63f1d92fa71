"""Capture .explain("formatted") output for named declared queries (or
bench-internal frames) into plans/<tag>/<name>_<suffix>.txt.

Usage: python tools/capture_plans.py --tag r12 --suffix before [names...]
Default names = every declared query; pass a subset to stay cheap.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def explain_formatted(df) -> str:
    """The string df.explain('formatted') prints (PySpark prints via
    PythonSQLUtils.explainString — call it directly to capture)."""
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main():
    argv = sys.argv[1:]
    tag, suffix, names = "r12", "before", []
    i = 0
    while i < len(argv):
        if argv[i] == "--tag":
            tag = argv[i + 1]
            i += 2
        elif argv[i] == "--suffix":
            suffix = argv[i + 1]
            i += 2
        else:
            names.append(argv[i])
            i += 1

    import __spark_entry__ as entry
    from hindex_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("capture_plans")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(outdir, exist_ok=True)
    qs = entry.queries()
    want = names or list(qs)
    for name in want:
        fn = qs.get(name)
        if fn is None:
            print(f"SKIP {name}: not a declared query", file=sys.stderr)
            continue
        try:
            df = fn(spark, sf_dir)
            plan = explain_formatted(df)
        except Exception as e:  # noqa: BLE001 - capture what we can
            plan = f"ERROR: {type(e).__name__}: {e}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
