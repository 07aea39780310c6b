#!/usr/bin/env python3
"""Per-family scaling report: compares two Bench JSON lines (e.g. sf0.1 vs
sf1, a 10x data growth) and emits per-family time ratios + implied scaling
exponent (log10 of the ratio when the data grew 10x).

Usage: scale_report.py <bench_small.json> <bench_big.json> [factor=10]
"""
import json
import math
import re
import sys
from collections import defaultdict

FAMILY_PATTERNS = [
    ("generators", r"^gen_"),
    ("relational", r"^(rel_q|topk_per_key|agg_)"),
    ("joins", r"^join_"),
    ("io", r"^io_"),
    ("dedup", r"^dedup_"),
    ("similarity", r"^sim_"),
    ("text", r"^text_"),
    ("events/timeseries", r"^events_"),
    ("multimodal", r"^mm_"),
    ("graph", r"^graph_"),
    ("streaming", r"^stream_"),
    ("merge/cdc", r"^merge_"),
    ("layout", r"^layout_"),
    ("sampling/mixture", r"^(sample_|pack_)"),
    ("privacy", r"^priv_"),
    ("diagnostics", r"^(diag_|report_)"),
    ("pipeline", r"^pipeline_"),
    ("fuzz", r"^fuzz_"),
]


def family(name: str) -> str:
    for fam, pat in FAMILY_PATTERNS:
        if re.match(pat, name):
            return fam
    return "other"


def load(path: str) -> dict:
    """Times per query: FIRST run when raw runs are recorded (fresh-vs-fresh
    — medians flatter gates whose first run materializes a persisted
    derivation, e.g. graph_triangles' cached edge list), else the median."""
    with open(path) as f:
        d = json.loads(f.read().strip().splitlines()[-1])
    if "runs" in d:
        d = dict(d, queries={k: d["runs"].get(k, [v])[0]
                             for k, v in d["queries"].items()})
    return d


def main() -> None:
    small, big = load(sys.argv[1]), load(sys.argv[2])
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    # Optional 4th arg: JSON of {query: [t_small, t_big]} re-measurements
    # (post-fix numbers measured outside the recorded bench files).
    if len(sys.argv) > 4:
        for name, (ts, tb) in json.load(open(sys.argv[4])).items():
            if name not in small["queries"] and name not in big["queries"]:
                raise SystemExit(f"override key {name!r} matches no bench "
                                 "query - typo would silently double-count")
            if ts is not None:
                small["queries"][name] = ts
            if tb is not None:
                big["queries"][name] = tb
    qs, qb = small["queries"], big["queries"]
    one_sided = sorted(set(qs) ^ set(qb))
    if one_sided:
        print(f"WARNING: {len(one_sided)} gate(s) present in only one bench "
              f"file, EXCLUDED from all totals: {', '.join(one_sided)}")
    fam_s, fam_b = defaultdict(float), defaultdict(float)
    per_query = []
    for name, ts in qs.items():
        if name not in qb:
            continue
        tb = qb[name]
        fam_s[family(name)] += ts
        fam_b[family(name)] += tb
        per_query.append((tb / max(ts, 1e-9), ts, tb, name))

    print(f"{'family':<20}{'t_small':>9}{'t_big':>9}{'ratio':>8}{'exponent':>9}")
    rows = []
    for fam in sorted(fam_s, key=lambda f: -fam_b[f]):
        ts, tb = fam_s[fam], fam_b[fam]
        ratio = tb / max(ts, 1e-9)
        expo = math.log(ratio) / math.log(factor)
        rows.append((fam, ts, tb, ratio, expo))
        print(f"{fam:<20}{ts:>9.2f}{tb:>9.2f}{ratio:>8.2f}{expo:>9.2f}")
    tot_s = sum(fam_s.values())
    tot_b = sum(fam_b.values())
    print(f"{'TOTAL':<20}{tot_s:>9.2f}{tot_b:>9.2f}"
          f"{tot_b / tot_s:>8.2f}{math.log(tot_b / tot_s) / math.log(factor):>9.2f}")

    print("\nTop-15 per-query ratios (big/small):")
    for ratio, ts, tb, name in sorted(per_query, reverse=True)[:15]:
        print(f"  {name:<34}{ts:>8.2f}s ->{tb:>8.2f}s   x{ratio:5.1f}")

    out = {
        "factor": factor,
        "families": {f: {"t_small": ts, "t_big": tb, "ratio": tb / max(ts, 1e-9),
                         "exponent": math.log(tb / max(ts, 1e-9)) / math.log(factor)}
                     for f, ts, tb, _, _ in rows},
        "total": {"t_small": tot_s, "t_big": tot_b, "ratio": tot_b / tot_s},
    }
    with open("target/scale_report.json", "w") as f:
        json.dump(out, f, indent=2)
    print("\nwrote target/scale_report.json")


if __name__ == "__main__":
    main()
