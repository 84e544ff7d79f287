#!/usr/bin/env python3
"""Pin: docs/CATALOG.md's exponent column == the LAST SCALE.md mention
for every individually-measured entry (r15 verdict item 1 — the doc is
generated, so the drift mode this guards is "SCALE.md gained a newer
measurement but the doc was not regenerated", plus parser regressions).

Exits nonzero listing every mismatch. Run in the round-close checklist
right after gen_catalog_doc.py.
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_catalog_doc import ROOT, scale_exponents  # noqa: E402


def catalog_exponents():
    """(all entry names, entry -> exp-column string) from
    docs/CATALOG.md; the dict skips blank and family-fallback
    (`<=X fam`) cells — those have no per-entry SCALE.md row to pin
    against."""
    out = {}
    names = set()
    row = re.compile(r"^\|\s*`([a-z0-9_]+)`\s*\|[^|]*\|[^|]*\|[^|]*\|"
                     r"\s*([^|]*?)\s*\|")
    for line in open(os.path.join(ROOT, "docs", "CATALOG.md")):
        m = row.match(line)
        if not m:
            continue
        names.add(m.group(1))
        if m.group(2) and "fam" not in m.group(2):
            out[m.group(1)] = m.group(2)
    return names, out


def main():
    scale = scale_exponents()
    all_names, doc = catalog_exponents()
    bad = []
    for name, exp in sorted(doc.items()):
        want = scale.get(name)
        if want is None:
            bad.append(f"{name}: doc shows {exp} but SCALE.md has no "
                       "measured row")
        elif exp.lstrip("~") != want.lstrip("~"):
            bad.append(f"{name}: doc shows {exp}, last SCALE.md "
                       f"measurement is {want}")
    # the reverse direction: a measured CATALOG entry whose doc cell
    # went blank or fell back to the family aggregate (SCALE.md rows
    # for non-entry names — tools, plan probes — are not pinned)
    for name in sorted((set(scale) & all_names) - set(doc)):
        bad.append(f"{name}: measured in SCALE.md ({scale[name]}) but "
                   "docs/CATALOG.md shows no per-entry exponent — "
                   "regenerate the doc")
    if bad:
        print("CATALOG exp drift (%d):" % len(bad))
        for b in bad:
            print("  " + b)
        sys.exit(1)
    print(f"catalog exp pinned: {len(doc)} measured entries match the "
          "last SCALE.md mention")


if __name__ == "__main__":
    main()
