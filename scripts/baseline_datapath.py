#!/usr/bin/env python3
"""Like-for-like DuckDB baseline measurement (round 17 — VERDICT r16 item 2).

Times oracle SQL texts (the exact strings the correctness driver runs,
dumped by `graft.Verify` into <outDir>/oracle_sql.json) in DuckDB at a
configurable thread count, best-of-3, against the sf0.1 parquet tables.
Two query sets:

  headline  — the 12 BASELINE.md headline queries (re-measured at
              threads=32 to retire the 4-vs-32-thread asymmetry the
              r16 verdict flagged; BASELINE.md's original table was
              threads=4 vs Spark local[32])
  datapath  — the 10 slowest *data-path* ops from the FULLBENCH sweep
              (maintenance/write-I/O-bound ops excluded: snapshot
              compact/optimize/incremental rewrite the table by
              design; bucketed-join is a write fixture), so the 2x
              bench gate is decided by real compute, not by sub-0.2 s
              queries sitting under Spark's fixed local-mode overhead.

The datapath set runs the TWO-POINT slope protocol (same as
graft.DatapathBench): best-of-3 at sf0.01 and at sf0.1 in one process,
comparator = t(sf0.1) - t(sf0.01), per-query constants differenced out.

Usage: python3 scripts/baseline_datapath.py <sf01Dir> <verifyOutDir> [threads] [sfLoDir]
"""
import sys, json, time
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

HEADLINE = [
    "agg_hash_groupby", "join_multiway_5", "win_topk_per_group",
    "agg_rollup", "topk_global", "join_anti", "stream_session_window",
    "stream_tumbling_window", "text_tokenize_wordcount", "sim_knn_topk",
    "json_funcs", "etl_gap_fill",
]

DATAPATH = [
    "sim_sparse_cosine_topk", "graph_clustering_coefficient",
    "agg_rfm_segments", "graph_jaccard_links", "graph_adamic_adar",
    "agg_winsorized_mean", "sim_ann_ivfpq", "graph_degree_assortativity",
    "text_kneser_ney_lm", "agg_corr_matrix",
]


def best_of_3(con, sql):
    best = float("inf")
    rows = None
    for _ in range(3):
        t0 = time.monotonic()
        rows = con.execute(sql).fetchall()
        best = min(best, time.monotonic() - t0)
    return best, len(rows)


def connect(sf, threads):
    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    return con


def main():
    sf, outdir = sys.argv[1], sys.argv[2]
    threads = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    sf_lo = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.01"
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))

    con = connect(sf, threads)
    print(f"\n== headline (threads={threads}, best-of-3, {sf}) ==")
    total = 0.0
    for name in HEADLINE:
        sec, n = best_of_3(con, oracles[name])
        total += sec
        print(f"{name:32s}  {sec:8.3f} s  {n:8d} rows")
    print(f"{'TOTAL':32s}  {total:8.3f} s")

    # two-point slope protocol — mirror graft.DatapathBench exactly:
    # per op, best-of-3 at the lo point then at the hi point, slope =
    # t(hi) - t(lo). Session constants cancel in the difference.
    con_lo = connect(sf_lo, threads)
    print(f"\n== datapath slope (threads={threads}, lo={sf_lo}, hi={sf}) ==")
    tot_slope = 0.0
    for name in DATAPATH + ["sim_knn_topk"]:
        sql = oracles[name]
        t_lo, _ = best_of_3(con_lo, sql)
        t_hi, _ = best_of_3(con, sql)
        slope = t_hi - t_lo
        tot_slope += slope
        print(f"{name:32s}  lo {t_lo:7.3f}  hi {t_hi:7.3f}  slope {slope:8.3f} s")
    print(f"{'TOTAL SLOPE':32s}  {tot_slope:8.3f} s")


if __name__ == "__main__":
    main()
