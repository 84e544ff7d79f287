#!/usr/bin/env python3
"""Generate docs/CATALOG.md from the catalog itself.

Scans src/main/scala/graft/queries/*.scala for `"name" -> Entry(` sites,
captures each entry's preceding `//` comment block (the human description
that already lives next to the code), whether a DuckDB oracle twin is
present, and the defining module. Optionally merges:
  - per-entry sf0.1 seconds from a Bench full-JSON artifact (arg 1), and
  - the latest measured sf0.1->sf1 exponent per entry from SCALE.md.

Usage: gen_catalog_doc.py [BENCH_full.json]
Writes docs/CATALOG.md. Generated, not hand-rolled — rerun after catalog
changes.
"""
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QDIR = os.path.join(ROOT, "src/main/scala/graft/queries")


def parse_module(path):
    """Yield (name, has_oracle, is_probe, scale_twin, description) per
    Entry in one module file."""
    lines = open(path).read().split("\n")
    entry_re = re.compile(r'^\s*"([a-z0-9_]+)"\s*->\s*Entry\(')
    out = []
    for i, line in enumerate(lines):
        m = entry_re.match(line)
        if not m:
            continue
        name = m.group(1)
        # walk back over the contiguous // comment block
        desc_lines = []
        j = i - 1
        while j >= 0 and lines[j].strip().startswith("//"):
            desc_lines.append(lines[j].strip().lstrip("/").strip())
            j -= 1
        desc_lines.reverse()
        desc = " ".join(desc_lines)
        # first sentence only, keep the table readable (don't split on
        # citation/latin abbreviations like "et al." / "e.g.")
        first = ""
        if desc:
            parts = re.split(r"(?<=[.!?])\s", desc)
            take = []
            for p in parts:
                take.append(p)
                if not re.search(r"\b(al|e\.g|i\.e|vs|cf)\.$", p):
                    break
            first = " ".join(take)
        # oracle present iff a Some(...) appears before the NEXT Entry
        # site (inline """SQL""" or a composed helper like pqPipelineSql).
        # Heuristic: a Some( inside the query lambda itself would also
        # match — acceptable because CatalogInvariantsSpec separately
        # enforces that EVERY entry ships an oracle, so a mislabel here
        # cannot mask a real gap.
        k = i + 1
        while k < len(lines) and not entry_re.match(lines[k]):
            k += 1
        scope = "\n".join(lines[i:k])
        has_oracle = re.search(r"\bSome\s*[\({]", scope) is not None
        # Entry(..., probe = true) marks a diagnostic/ground-truth
        # posture (Catalog.Entry scaladoc) — surfaced as the posture
        # column so the catalog itself says which rows are scale
        # postures and which are probes
        is_probe = re.search(r"\bprobe\s*=\s*true", scope) is not None
        # Entry(..., scaleTwin = Some("name")) marks a
        # reference-semantics posture: the unbounded reference shape,
        # kept as the correctness anchor, with `name` the bounded twin
        # to run at 100 TB (Catalog.Entry scaladoc)
        tw = re.search(r'scaleTwin\s*=\s*Some\("([a-z0-9_]+)"\)', scope)
        scale_twin = tw.group(1) if tw else None
        out.append((name, has_oracle, is_probe, scale_twin, first))
    return out


def scale_exponents():
    """name -> exponent from SCALE.md, LAST row per name wins in file
    order regardless of table shape (the file is chronological, so the
    most recent re-measurement is always the freshest number — r15
    verdict: a shape-rank preference here let an old 7-cell row shadow
    a newer 4-cell campaign row). Three table shapes: the main 5-cell
    exponent table, the 4-cell campaign table (**exp**), and the r12
    7-cell sf3 three-point table whose last cell is the full-decade
    **fit**."""
    best = {}
    rows = [
        re.compile(r"^\|\s*([a-z0-9_]+)[^|]*\|[^|]*\|[^|]*\|[^|]*\|"
                   r"\s*~?([0-9.]+)\s*\|\s*$"),
        re.compile(r"^\|\s*([a-z0-9_]+)[^|]*\|[^|]*\|[^|]*\|"
                   r"\s*\*\*~?([0-9.]+)\*\*[^|]*\|\s*$"),
        re.compile(r"^\|\s*([a-z0-9_]+)[^|]*\|[^|]*\|[^|]*\|[^|]*\|"
                   r"[^|]*\|[^|]*\|\s*\*\*~?([0-9.]+)\*\*\s*\|\s*$"),
    ]
    for line in open(os.path.join(ROOT, "SCALE.md")):
        for row in rows:
            m = row.match(line)
            if m:
                best[m.group(1)] = m.group(2)
                break
    return best


def family_of(name, mod):
    """Scale-behavior family of an entry: the module, except
    DedupSimQueries (one module spanning ANN serving, embedding dedup,
    connected-components dedup and hash/LSH dedup — families with very
    different measured slopes)."""
    if mod == "DedupSimQueries":
        if re.match(r"^(ivf|pq_|ivfpq|knn_|ann_|vec_)", name):
            return "ann-serving"
        if re.match(r"^(semantic_|cosine_near_dup)", name):
            return "embedding-dedup"
        if re.match(r"^(dedup_clusters|dedup_apply|cluster_safe_split"
                    r"|dedup_triage_apply)", name):
            return "cc-dedup"
        return "hash-dedup"
    return {
        "CoreQueries": "core-relational",
        "SeriesQueries": "timeseries",
        "StatsQueries": "stats",
        "TextQueries": "text",
        "CorpusQueries": "corpus",
        "PipelineQueries": "pipeline",
        "RelationalExtQueries": "relational-ext",
        "RetrievalQueries": "retrieval",
    }.get(mod, mod)


def family_fallbacks(modules, exps):
    """family -> (max measured exponent over the family's PROD entries,
    count of measured members). Probe and reference-semantics entries
    are excluded — their exponents describe diagnostic output contracts
    (all-pairs lists, brute-force scans) or shapes the catalog itself
    says not to ship at scale, not the family's production posture."""
    fam = {}
    for mod, entries in modules.items():
        for (name, _, is_probe, scale_twin, _) in entries:
            if is_probe or scale_twin or name not in exps:
                continue
            try:
                v = float(exps[name].lstrip("~"))
            except ValueError:
                continue
            f = family_of(name, mod)
            mx, n = fam.get(f, (0.0, 0))
            fam[f] = (max(mx, v), n + 1)
    return fam


def main():
    bench = {}
    bench_doc = {}
    if len(sys.argv) > 1:
        bench_doc = json.loads(open(sys.argv[1]).read().strip())
        bench = bench_doc["queries"]
    exps = scale_exponents()
    modules = {}
    for path in sorted(glob.glob(os.path.join(QDIR, "*.scala"))):
        mod = os.path.basename(path).replace(".scala", "")
        if mod == "Catalog":
            continue
        entries = parse_module(path)
        if entries:
            modules[mod] = entries
    total = sum(len(v) for v in modules.values())
    with_oracle = sum(1 for v in modules.values()
                      for (_, o, _, _, _) in v if o)
    n_probe = sum(1 for v in modules.values() for (_, _, p, _, _) in v if p)
    n_ref = sum(1 for v in modules.values() for (_, _, _, t, _) in v if t)
    out = []
    out.append("# Catalog — the engine's query surface\n")
    out.append("GENERATED by `tools/gen_catalog_doc.py` — do not hand-edit; "
               "rerun after catalog changes.\n")
    src = (os.path.relpath(sys.argv[1], ROOT)
           if len(sys.argv) > 1 else "(no bench artifact given)")
    rest = ("" if with_oracle == total else
            " (the rest are streaming assemblies verified by ScalaTest "
            "specs)")
    out.append(f"{total} entries across {len(modules)} modules; "
               f"{with_oracle} carry a DuckDB oracle twin{rest}. "
               f"{n_probe} entries are `probe` posture — diagnostic/"
               "ground-truth rows kept to verify or measure a production "
               "twin, not the shape you would run at 100 TB — and "
               f"{n_ref} are `ref→twin` posture: the reference's exact "
               "unbounded shape kept as the correctness anchor, with "
               "the named bounded twin being the row to run at scale "
               "(their fits describe a shape the catalog itself says "
               "not to ship, so they are excluded from family-fallback "
               "exponents). "
               f"Seconds are sf0.1 local[32] per-entry minima from "
               f"`{src}`; exponent is the LATEST measured scale "
               "exponent from SCALE.md — per-decade where only "
               "sf0.1→sf1 was measured, the full-range fit (up to 100×, "
               "sf0.1→sf10) where the r13/r14 campaigns cover the "
               "entry. Entries not individually measured show their "
               "FAMILY's most conservative measured exponent as "
               "`≤X fam` (max over the family's measured prod entries; "
               "probe rows excluded from the aggregate), so every row "
               "answers \"will this scale\". Blank = family has no "
               "measured member yet.\n")
    if "value_prod" in bench_doc:
        out.append(
            f"Headline: **{bench_doc['value']:.1f} s** over "
            f"{bench_doc.get('n_entries', len(bench))} entries; "
            f"**prod-posture subtotal {bench_doc['value_prod']:.1f} s** "
            f"over {bench_doc.get('n_prod', '?')} prod entries (probe / "
            "ref→twin diagnostics excluded — the number that tracks "
            "shipping shapes round over round).\n")
    fam = family_fallbacks(modules, exps)
    for mod, entries in sorted(modules.items()):
        out.append(f"\n## {mod} ({len(entries)} entries)\n")
        out.append("| entry | oracle | posture | sf0.1 s | exp | "
                   "description |")
        out.append("|---|---|---|---|---|---|")
        for name, has_oracle, is_probe, scale_twin, desc in entries:
            sec = f"{bench[name]:.2f}" if name in bench else ""
            exp = exps.get(name, "")
            if not exp:
                f = family_of(name, mod)
                if f in fam:
                    exp = f"≤{fam[f][0]:.2f} fam"
            o = "duckdb" if has_oracle else "spec"
            p = ("probe" if is_probe else
                 f"ref\u2192`{scale_twin}`" if scale_twin else "prod")
            d = desc.replace("|", "\\|")
            out.append(f"| `{name}` | {o} | {p} | {sec} | {exp} | {d} |")
    dest = os.path.join(ROOT, "docs", "CATALOG.md")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    with open(dest, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {dest}: {total} entries, {with_oracle} with oracle")
    # run the exp-recency pin right here so a regeneration can never
    # leave (or silently create) a stale exponent without failing loudly
    # (import at call time: check_catalog_exp imports scale_exponents
    # from this module, which is fully loaded by now)
    import check_catalog_exp
    check_catalog_exp.main()


if __name__ == "__main__":
    main()
