#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (SURVEY.md §5.2 t2).

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle SQL in DuckDB against the parquet tables in <sfDir>, loads the
Spark result parquet from <verifyOutDir>/<name>/, sorts columns by name
(mirroring the driver's canonicalization), and compares cell-by-cell.

This is a build-side iteration tool only; the driver runs its own copy.
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(v):
    # canonicalize a cell for comparison
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            # the driver's hash is byte-level, so -0.0 != +0.0 there;
            # plain Python equality would hide the divergence locally
            return (0.0, math.copysign(1.0, v))
        return v
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(canon(x) for x in v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None)
    return v

def frame_cells(df):
    df = df[sorted(df.columns)]
    return [tuple(canon(v) for v in row) for row in df.itertuples(index=False, name=None)]

def main():
    sf, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in oracles.items():
        if only and name not in only:
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = pd.read_parquet(files[0])
            ora_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if sorted(spark_df.columns) != sorted(ora_df.columns):
            print(f"FAIL {name}: schema spark={sorted(spark_df.columns)} oracle={sorted(ora_df.columns)}")
            n_fail += 1
            continue
        dtype_diffs = [
            (c, str(spark_df[c].dtype), str(ora_df[c].dtype))
            for c in spark_df.columns
            if str(spark_df[c].dtype) != str(ora_df[c].dtype)
        ]
        if dtype_diffs:
            print(f"WARN {name}: dtype diffs {dtype_diffs}")
        s_cells, o_cells = frame_cells(spark_df), frame_cells(ora_df)
        if len(s_cells) != len(o_cells):
            print(f"FAIL {name}: rows spark={len(s_cells)} oracle={len(o_cells)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(s_cells, o_cells)) if a != b]
        if bad:
            i, a, b = bad[0]
            cols = sorted(spark_df.columns)
            print(f"FAIL {name}: {len(bad)}/{len(s_cells)} rows differ; first row {i}:")
            for c, x, y in zip(cols, a, b):
                mark = "" if x == y else "   <-- DIFF"
                print(f"    {c}: spark={x!r} oracle={y!r}{mark}")
            n_fail += 1
        else:
            print(f"ok   {name} ({len(s_cells)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
