"""Diff two bench artifacts with ambient-noise filtering.

Round-over-round bench totals on this host swing ~2x for identical code
(recorded band: ~21-47 s at sf0.1), so a naive per-line ratio flags
phantom regressions every round. This diff uses the artifacts'
`run_samples` (sorted per-line run times, recorded since round 11) to
ask a sharper question: is the NEW line's BEST run worse than the OLD
line's WORST run by more than `--margin` (default 1.25x)? Only then is
host noise an implausible explanation — min-vs-max across both
artifacts brackets the ambient spread each side observed.

Artifacts without run_samples (pre-r11) degrade to min-vs-min with a
wider default margin (2x), which is exactly the manual rule earlier
rounds applied by hand.

Usage:
    python tools/bench_diff.py OLD.json NEW.json \
        [OLD_detail.json NEW_detail.json] [--margin 1.25]

Prints one JSON line: flagged regressions, improvements (same test,
mirrored), added/removed lines, and the loadavg fingerprints.
"""

from __future__ import annotations

import json
import sys


def _spread(artifact: dict, name: str):
    """(best, worst) observed for a line, falling back to (min, min)."""
    t = artifact["queries"][name]
    samples = artifact.get("run_samples", {}).get(name)
    if samples:
        return samples[0], samples[-1]
    return t, t


def diff(old: dict, new: dict, margin: float = 1.25,
         legacy_margin: float = 2.0) -> dict:
    shared = sorted(set(old["queries"]) & set(new["queries"]))
    regressions, improvements, lines = [], [], {}
    for name in shared:
        o_best, o_worst = _spread(old, name)
        n_best, n_worst = _spread(new, name)
        has_samples = (name in old.get("run_samples", {})
                       and name in new.get("run_samples", {}))
        m = margin if has_samples else legacy_margin
        lines[name] = {"old_min": o_best, "new_min": n_best,
                       "ratio": round(n_best / o_best, 3) if o_best else None}
        if n_best > o_worst * m:
            regressions.append({
                "name": name, "old_best": o_best, "old_worst": o_worst,
                "new_best": n_best, "margin": m,
                "severity": round(n_best / (o_worst * m), 2),
            })
        elif o_best > n_worst * m:
            improvements.append({
                "name": name, "old_best": o_best, "new_best": n_best,
                "new_worst": n_worst, "margin": m,
            })
    return {
        "shared_lines": len(shared),
        "total_old": round(sum(old["queries"][n] for n in shared), 2),
        "total_new": round(sum(new["queries"][n] for n in shared), 2),
        "regressions": sorted(regressions, key=lambda r: -r["severity"]),
        "improvements": improvements,
        "added": sorted(set(new["queries"]) - set(old["queries"])),
        "removed": sorted(set(old["queries"]) - set(new["queries"])),
        "loadavg_old": old.get("loadavg_before"),
        "loadavg_new": new.get("loadavg_before"),
    }


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    margin = 1.25
    for a in sys.argv[1:]:
        if a.startswith("--margin"):
            margin = float(a.split("=", 1)[1] if "=" in a
                           else sys.argv[sys.argv.index(a) + 1])
    def _load(p, detail_path=None):
        d = json.load(open(p))
        # driver BENCH_r{N}.json artifacts wrap bench.py's line under
        # "parsed"; raw bench.py output is already the line itself
        d = d.get("parsed", d) if "queries" not in d else d
        # Since round 12 run_samples live in a BENCH_detail.json
        # sidecar (the stdout line must stay under the driver's tail
        # cap); merge one in when given.
        if detail_path and "run_samples" not in d:
            d = dict(d, **json.load(open(detail_path)))
        return d

    old = _load(args[0], args[2] if len(args) > 2 else None)
    new = _load(args[1], args[3] if len(args) > 3 else None)
    out = diff(old, new, margin)
    print(json.dumps(out, indent=2))
    sys.exit(1 if out["regressions"] else 0)


if __name__ == "__main__":
    main()
