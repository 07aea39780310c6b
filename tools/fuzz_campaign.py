#!/usr/bin/env python3
"""Dev-only DuckDB half of the mass fuzz campaign (NOT part of the library).

Runs after `sbt "runMain graft.FuzzCampaign <sfDir> <outDir> <seedStart>
<seedCount> [nQueries]"`: for every <outDir>/seed_<s>.sql it executes the
identical SQL text in DuckDB over the same parquet tables, diffs the
(qid, n_rows, digest) board against the Spark parquet in <outDir>/seed_<s>,
and writes a campaign summary JSON to stdout (redirect to FUZZ_rN.json).

    python3 tools/fuzz_campaign.py <sfDir> <outDir> [note]
"""
import glob
import json
import os
import re
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir: str, out_dir: str, note: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    sql_files = sorted(glob.glob(os.path.join(out_dir, "seed_*.sql")))
    total = matches = 0
    divergences = []
    seeds = []
    for sf in sql_files:
        seed = re.search(r"seed_(\d+)\.sql$", sf).group(1)
        seeds.append(int(seed))
        sql = open(sf).read()
        want = con.execute(sql).fetchdf()
        got = pd.read_parquet(os.path.join(out_dir, f"seed_{seed}"))
        got = got.sort_values("qid", ignore_index=True)
        want = want.sort_values("qid", ignore_index=True)
        if len(got) != len(want):
            divergences.append({"seed": int(seed), "qid": -1,
                                "what": f"board rows {len(got)} != {len(want)}"})
            continue
        for i in range(len(got)):
            total += 1
            g, w = got.iloc[i], want.iloc[i]
            if (int(g.qid) == int(w.qid) and int(g.n_rows) == int(w.n_rows)
                    and int(g.digest) == int(w.digest)):
                matches += 1
            else:
                divergences.append({
                    "seed": int(seed), "qid": int(g.qid),
                    "spark": {"n_rows": int(g.n_rows), "digest": int(g.digest)},
                    "duckdb": {"n_rows": int(w.n_rows), "digest": int(w.digest)}})
    report = {
        "campaign": note,
        "seeds": seeds,
        "campaign_queries": total,
        "matches": matches,
        "mismatches": total - matches,
        "divergences": divergences,
        "note": ("each battery is the SAME SQL text run on Spark and DuckDB; "
                 "a mismatch names the (seed, qid) whose (n_rows, digest) "
                 "row diverged."),
    }
    print(json.dumps(report, indent=1))
    return 0 if matches == total and total > 0 else 1


if __name__ == "__main__":
    note = sys.argv[3] if len(sys.argv) > 3 else "QueryFuzz mass differential"
    sys.exit(main(sys.argv[1], sys.argv[2], note))
