#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query dumped by
graft.Verify, run its oracle SQL in DuckDB over the same parquet tables and
compare rows/schema/values (columns sorted by name, rows sorted).

Usage: check_correctness.py <sfDir> <verifyOutDir>
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    results = {}
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(qdir)
        if not os.path.isdir(qdir):
            continue
        got = pd.read_parquet(qdir)
        # fail-closed marker from Verify: the query threw and dumped a
        # one-row {err} frame instead of results — always a red row
        if list(got.columns) == ["err"]:
            results[name] = {"rows": len(got), "ok": False,
                             "err": str(got["err"].iloc[0]) if len(got) else "?"}
            continue
        if name not in oracles:
            results[name] = {"rows": len(got), "oracle": False,
                             "ok": len(got) > 0}
            continue
        want = con.execute(oracles[name]).df()
        g, w = norm(got), norm(want)
        rows_match = len(g) == len(w)
        schema_match = list(g.columns) == list(w.columns)
        values_match = False
        if rows_match and schema_match:
            try:
                pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                              check_exact=True)
                values_match = True
            except AssertionError as e:
                values_match = False
                results[name + "__detail"] = str(e).split("\n")[0:6]
        results[name] = {"rows": len(g), "oracle_rows": len(w),
                         "rows_match": rows_match,
                         "schema_match": schema_match,
                         "values_match": values_match,
                         "ok": rows_match and schema_match and values_match}
        if not schema_match:
            results[name]["got_cols"] = list(g.columns)
            results[name]["want_cols"] = list(w.columns)

    ok = sum(1 for v in results.values()
             if isinstance(v, dict) and v.get("ok"))
    total = sum(1 for v in results.values() if isinstance(v, dict) and "ok" in v)
    print(json.dumps(results, indent=1, default=str))
    print(f"== {ok}/{total} queries ok", file=sys.stderr)
    sys.exit(0 if ok == total else 1)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
