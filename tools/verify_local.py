#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: read each Verify output
parquet, run the matching oracle SQL in DuckDB over the same sf dir, and
compare (rows sorted, columns sorted by name). Usage:
    python3 tools/verify_local.py <sfDir> <verifyOutDir> [--dtypes]

--dtypes adds the oracle-type-hygiene lint: the driver's hash keys on
dtype, so an oracle column that DuckDB promotes (SUM(BIGINT) -> HUGEINT,
AVG -> DECIMAL, integer '/' -> ...) FAILS the round even when every value
matches. The lint compares each oracle column's surfaced pandas dtype
against the Spark parquet's and fails on any numeric-kind mismatch
(int64 vs float64/object/decimal), which is exactly how round 6 lost its
only red row (q148).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def dtype_mismatches(g, w):
    """Columns whose oracle dtype would hash differently from Spark's.

    The driver surfaces DuckDB HUGEINT as float64 or object and DECIMAL as
    object — any of those against a Spark int64/float64 flips the hash.
    The comparison is on dtype KIND (int/float/object/bool/datetime), not
    width: int32 vs int64 hashes identically driver-side (q23 is green),
    while int64 vs float64/object is exactly how q148 went red in r6.
    """
    bad = []
    for c in g.columns:
        gk, wk = g[c].dtype.kind, w[c].dtype.kind
        if gk == wk or {gk, wk} <= {"i", "u"}:
            continue
        bad.append((c, f"spark={g[c].dtype}", f"oracle={w[c].dtype}"))
    return bad

def main(sf_dir, out_dir, check_dtypes=False):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in sorted(spark_files)])
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1; continue
        g, w = norm(got), norm(want)
        if check_dtypes:
            bad = dtype_mismatches(g, w)
            if bad:
                print(f"FAIL {name}: dtype mismatch {bad}"); n_fail += 1; continue
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}"); n_fail += 1; continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
        except AssertionError as e:
            msg = str(e).split("\n")[0:4]
            # find first differing cell for diagnostics
            diff = None
            for c in g.columns:
                neq = (g[c].astype(object) != w[c].astype(object)) & ~(g[c].isna() & w[c].isna())
                if neq.any():
                    i = neq.idxmax()
                    diff = (c, i, g[c][i], w[c][i]); break
            print(f"FAIL {name}: {msg[0]} first-diff={diff}"); n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--dtypes"]
    sys.exit(main(args[0], args[1], check_dtypes="--dtypes" in sys.argv))
