#!/usr/bin/env python3
"""Build bench/min_combined_r18.json from the fixed-4 sweeps (protocol:
per-entry min over EXACTLY 4 fresh-JVM full-catalog sweeps on the final
round tree; NOTES "bench protocol"). best_ever = these 4 + r17's
min-combined (16 runs deep), all entries (no implementation changed in
r18 — the catalog diff is oracle SQL strings only, TRY_CAST rendering
with identical in-range values).

The prod-posture entry set is parsed from docs/CATALOG.md's posture
column (prod vs probe / ref→twin)."""
import json
import re
import sys

ROOT = "/root/repo"
RUNS = [f"bench/r18/BENCH_full_r18_fix{i}.json" for i in (1, 2, 3, 4)]


def load(p):
    with open(f"{ROOT}/{p}") as f:
        return json.loads(f.read().strip())


def postures():
    out = {}
    row = re.compile(r"^\|\s*`([a-z0-9_]+)`\s*\|[^|]*\|\s*([^|]*?)\s*\|")
    for line in open(f"{ROOT}/docs/CATALOG.md"):
        m = row.match(line)
        if m and m.group(1) != "entry":
            out[m.group(1)] = m.group(2)
    return out


def main(note):
    runs = [load(p) for p in RUNS]
    names = sorted(set().union(*[r["queries"] for r in runs]))
    mins = {n: min(r["queries"][n] for r in runs if n in r["queries"])
            for n in names}
    post = postures()
    missing = [n for n in names if n not in post]
    assert not missing, f"entries without a CATALOG.md posture: {missing}"
    prod = [n for n in names if post[n] == "prod"]
    r17 = load("bench/min_combined_r17.json")
    best = {n: min(mins[n], r17["best_ever"]["queries"].get(n, mins[n]))
            for n in names}
    out = {
        "metric": "total_min_combined",
        "unit": "sec",
        "value": sum(mins.values()),
        "value_prod": sum(mins[n] for n in prod),
        "n_entries": len(names),
        "n_prod": len(prod),
        "sf": "/root/testdata/sf0.1",
        "runs": RUNS,
        "protocol": note,
        "queries": mins,
        "best_ever": {
            "value": sum(best.values()),
            "n_runs": r17["best_ever"].get("n_runs", 16) + 4,
            "queries": best,
        },
    }
    with open(f"{ROOT}/bench/min_combined_r18.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"all {out['value']:.1f} s / {out['n_entries']} entries; "
          f"prod {out['value_prod']:.1f} s / {out['n_prod']}; "
          f"best_ever {out['best_ever']['value']:.1f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "FIXED-4 headline")
