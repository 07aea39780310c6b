#!/usr/bin/env python3
"""Three-point per-family scaling fit: a two-point exponent cannot
distinguish a constant from a slope, so this reads THREE Bench JSON files
(e.g. sf0.1, sf1, sf3) and reports each family's exponent on both decades
— exp_lo (point1 -> point2) and exp_hi (point2 -> point3) — plus the
curvature delta. A family whose exponent GROWS with scale is flagged for
adjudication (the round-9 verdict's ask).

The alarm is exp_hi > 1.05 — genuinely super-linear on the LARGER decade,
where fixed overheads no longer hide the trend. A positive drift
(exp_hi > exp_lo) alone is usually just small-scale constants washing
out (a gate with 0.3s of fixed setup looks artificially sub-linear at
sf0.1) and is reported as information, not failure.

Usage: scale_fit3.py <bench1.json> <bench2.json> <bench3.json> \
           <factor12> <factor23> [out.json] [overrides.json]

overrides.json: {gate: [t1|null, t2|null, t3|null]} re-measurements
(post-fix numbers measured outside the recorded bench files).

Times use the FIRST recorded run per gate (fresh-vs-fresh — medians
flatter gates whose first run materializes a persisted derivation).
"""
import json
import math
import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from scale_report import family, load  # noqa: E402


def main() -> None:
    b1, b2, b3 = (load(p) for p in sys.argv[1:4])
    f12, f23 = float(sys.argv[4]), float(sys.argv[5])
    out_path = sys.argv[6] if len(sys.argv) > 6 else "target/scale_fit3.json"
    overrides = json.load(open(sys.argv[7])) if len(sys.argv) > 7 else {}
    for name, ts in overrides.items():
        if name not in b1["queries"]:
            raise SystemExit(f"override key {name!r} matches no bench query")
        for b, t in zip((b1, b2, b3), ts):
            if t is not None:
                b["queries"][name] = t
    common = set(b1["queries"]) & set(b2["queries"]) & set(b3["queries"])
    dropped = sorted((set(b1["queries"]) | set(b2["queries"]) |
                      set(b3["queries"])) - common)
    if dropped:
        print(f"WARNING: {len(dropped)} gate(s) not in all three benches, "
              f"EXCLUDED: {', '.join(dropped)}")
    fams = {}
    for name in common:
        f = family(name)
        t = fams.setdefault(f, [0.0, 0.0, 0.0])
        t[0] += b1["queries"][name]
        t[1] += b2["queries"][name]
        t[2] += b3["queries"][name]
    print(f"{'family':<20}{'t1':>8}{'t2':>8}{'t3':>8}"
          f"{'exp_lo':>8}{'exp_hi':>8}{'drift':>8}")
    report = {}
    for f in sorted(fams, key=lambda f: -fams[f][2]):
        t1, t2, t3 = fams[f]
        e_lo = math.log(t2 / max(t1, 1e-9)) / math.log(f12)
        e_hi = math.log(t3 / max(t2, 1e-9)) / math.log(f23)
        drift = e_hi - e_lo
        grows = e_hi > 1.05  # super-linear where constants can't hide it
        flag = "  <-- SUPER-LINEAR at scale" if grows else ""
        print(f"{f:<20}{t1:>8.2f}{t2:>8.2f}{t3:>8.2f}"
              f"{e_lo:>8.2f}{e_hi:>8.2f}{drift:>8.2f}{flag}")
        report[f] = {"t1": t1, "t2": t2, "t3": t3,
                     "exp_lo": e_lo, "exp_hi": e_hi, "drift": drift,
                     "exponent_grows": grows}
    t1 = sum(v[0] for v in fams.values())
    t2 = sum(v[1] for v in fams.values())
    t3 = sum(v[2] for v in fams.values())
    print(f"{'TOTAL':<20}{t1:>8.2f}{t2:>8.2f}{t3:>8.2f}"
          f"{math.log(t2 / t1) / math.log(f12):>8.2f}"
          f"{math.log(t3 / t2) / math.log(f23):>8.2f}")
    out = {"factors": [f12, f23], "inputs": sys.argv[1:4],
           "families": report, "excluded": dropped,
           "total": {"t1": t1, "t2": t2, "t3": t3,
                     "exp_lo": math.log(t2 / t1) / math.log(f12),
                     "exp_hi": math.log(t3 / t2) / math.log(f23)}}
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"\nwrote {out_path}")


if __name__ == "__main__":
    main()
