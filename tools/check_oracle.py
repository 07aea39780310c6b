#!/usr/bin/env python3
"""Dev-only mirror of the driver's correctness gate (NOT part of the library).

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`: loads each
<outDir>/<name> parquet (Spark result), runs the matching oracle_sql.json
entry in DuckDB against the same parquet tables, sorts columns by name and
rows by value, and diffs. Usage:
    python3 tools/check_oracle.py <sfDir> <outDir>
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
    return a == b


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
            want = canon(con.execute(sql).fetchdf())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        ok = True
        for col in got.columns:
            ga, wa = got[col].tolist(), want[col].tolist()
            for i, (x, y) in enumerate(zip(ga, wa)):
                # scalar NA of any dtype (float NaN, NaT, pd.NA) -> None
                x = None if (x is not None and pd.isna(x)) else x
                y = None if (y is not None and pd.isna(y)) else y
                if not cells_equal(x, y):
                    print(f"FAIL {name}: col {col} row {i}: spark={x!r} duckdb={y!r}")
                    ok = False
                    failures += 1
                    break
            if not ok:
                break
        if ok:
            print(f"OK   {name} ({len(got)} rows)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
