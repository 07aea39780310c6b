#!/usr/bin/env python3
"""N-point per-family scaling fit over the INTERSECTION of gates.

scale_fit3.py assumes the same gate set in every bench file; when a
larger-scale point deliberately drops gates (e.g. the intended-quadratic
dedup witness is excluded from the sf10 run), family totals stop being
comparable. This variant restricts every point to the gates present in
ALL inputs, so the per-family exponents compare identical work.

Usage: scale_fit_points.py [--exclude g1,g2] out.json bench1.json \
           factor12 bench2.json factor23 bench3.json [factorNN benchN.json]

--exclude drops named gates from every point (e.g. a gate that
fail-fasted at one scale and therefore recorded no meaningful time).

Factors are the data-size ratios between consecutive points. Reports
per-family time at each point and the exponent on each consecutive
decade (first-run times, like scale_fit3).
"""
import json
import math
import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from scale_report import family, load  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    excluded = []
    if args[0] == "--exclude":
        excluded = args[1].split(",")
        args = args[2:]
    out_path = args[0]
    rest = args[1:]
    benches = [rest[0]]
    factors = []
    i = 1
    while i < len(rest):
        factors.append(float(rest[i]))
        benches.append(rest[i + 1])
        i += 2
    loaded = [load(p)["queries"] for p in benches]
    common = set(loaded[0])
    for d in loaded[1:]:
        common &= set(d)
    # dropped = genuinely missing from some input; excluded is separate.
    dropped = sorted(set().union(*loaded) - common)
    common -= set(excluded)
    fams = sorted({family(g) for g in common})
    report = {"inputs": benches, "factors": factors,
              "gates_common": len(common), "gates_dropped": dropped,
              "gates_excluded": excluded, "families": {}}
    hdr = "family".ljust(18) + "".join(
        f"t{i + 1}".rjust(10) for i in range(len(loaded))) + "".join(
        f"exp{i + 1}{i + 2}".rjust(8) for i in range(len(factors)))
    print(hdr)
    for fam in fams + ["TOTAL"]:
        gates = [g for g in common if fam == "TOTAL" or family(g) == fam]
        # 1e-9 floor: a zero family total (empty intersection, or a gate
        # that recorded 0.0) must not crash the whole fit.
        ts = [max(sum(d[g] for g in gates), 1e-9) for d in loaded]
        exps = [math.log(ts[i + 1] / ts[i]) / math.log(factors[i])
                for i in range(len(factors))]
        row = {"t": [round(t, 2) for t in ts],
               "exponents": [round(e, 3) for e in exps],
               "gates": len(gates)}
        if fam == "TOTAL":
            report["total"] = row
        else:
            report["families"][fam] = row
        print(fam.ljust(18) + "".join(f"{t:10.1f}" for t in ts) +
              "".join(f"{e:8.2f}" for e in exps))
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
