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
        if os.path.isdir(p):
            # Spark-written table (e.g. tools/ScaleUp output): a directory
            # of part files — possibly nested key=value subdirs when
            # written with partitionBy, hence the recursive glob +
            # hive_partitioning (which also restores partition columns)
            pat = os.path.join(p, "**", "*.parquet")
            if not glob.glob(pat, recursive=True):
                raise SystemExit(
                    f"table dir {p} exists but contains no parquet files")
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{pat}', hive_partitioning=true)")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    # Verify's machine-readable failure sidecar: the authoritative signal
    # that a query THREW (the {err} parquet marker is only its dir-level
    # shadow — a legitimate gate could emit a single column named err)
    verify_errors = {}
    err_path = os.path.join(out_dir, "_errors.json")
    if os.path.exists(err_path):
        with open(err_path) as f:
            verify_errors = json.load(f)

    results = {}
    dumped = set()
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(qdir)
        if not os.path.isdir(qdir):
            continue
        dumped.add(name)
        if name in verify_errors:
            results[name] = {"ok": False, "err": verify_errors[name]}
            continue
        got = pd.read_parquet(qdir)
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

    # fail CLOSED on vanished queries: an errored-listed query with no dir
    # (its marker write also failed) is a red row, and an oracle with no
    # dump at all is surfaced — either a deliberate SPARK_GRAFT_QUERIES
    # subset run (warning only) or a Verify run that died partway (the r11
    # failure mode: 4 crashed gates silently absent from an "80/80" report)
    for name, msg in verify_errors.items():
        if name not in results:
            results[name] = {"ok": False, "err": msg + " (no dump dir)"}
    missing = sorted(set(oracles) - dumped - set(verify_errors))
    if missing:
        print(f"== WARNING: {len(missing)} oracles have no dump "
              f"(subset run, or Verify died partway): {', '.join(missing)}",
              file=sys.stderr)

    ok = sum(1 for v in results.values()
             if isinstance(v, dict) and v.get("ok"))
    total = sum(1 for v in results.values() if isinstance(v, dict) and "ok" in v)
    print(json.dumps(results, indent=1, default=str))
    print(f"== {ok}/{total} queries ok", file=sys.stderr)
    sys.exit(0 if ok == total else 1)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
