#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (driver-side tooling only —
not part of the Spark library). Compares graft.Verify parquet dumps against
DuckDB running SparkEntry.oracleSql over the same testdata tables.

Usage:
  tools/run_main.sh graft.Verify /root/testdata/sf0.01 /tmp/verify_out
  python3 tools/local_verify.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load_spark_result(outdir, name):
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        return None
    return pq.read_table(files[0]).to_pandas()


def normalize(df):
    # sort columns by name (documented driver behavior), then rows by all cols
    df = df.reindex(sorted(df.columns), axis=1)
    try:
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    except Exception:
        df = df.reset_index(drop=True)
    return df


def compare(name, got, want):
    got, want = normalize(got), normalize(want)
    if list(got.columns) != list(want.columns):
        return f"FAIL cols: spark={list(got.columns)} oracle={list(want.columns)}"
    if len(got) != len(want):
        return f"FAIL rows: spark={len(got)} oracle={len(want)}"
    issues = []
    for c in got.columns:
        g, w = got[c], want[c]
        if np.issubdtype(g.dtype, np.floating) or np.issubdtype(w.dtype, np.floating):
            ga = g.astype(float).to_numpy()
            wa = w.astype(float).to_numpy()
            both_nan = np.isnan(ga) & np.isnan(wa)
            exact = np.array_equal(ga[~both_nan], wa[~both_nan])
            if not exact:
                with np.errstate(invalid="ignore"):
                    md = np.nanmax(np.abs(ga - wa))
                issues.append(f"{c}: float not bit-exact (maxdiff={md:.3e})")
        else:
            gs = g.astype(str).to_numpy()
            ws = w.astype(str).to_numpy()
            if not np.array_equal(gs, ws):
                bad = int((gs != ws).sum())
                i = int(np.argmax(gs != ws))
                issues.append(f"{c}: {bad} mismatched (first: {gs[i]!r} vs {ws[i]!r})")
    # dtype check (schema-match proxy)
    for c in got.columns:
        if str(got[c].dtype) != str(want[c].dtype):
            issues.append(f"{c}: dtype spark={got[c].dtype} oracle={want[c].dtype}")
    return "OK" if not issues else "FAIL " + "; ".join(issues)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_ok = 0
    dumped = sorted(
        d for d in os.listdir(outdir)
        if os.path.isdir(os.path.join(outdir, d)))
    # A query whose Verify run threw leaves no dump dir (Verify swallows
    # per-query exceptions) — report it as FAIL and count it in the
    # denominator instead of silently excluding it.
    missing = sorted(set(oracles) - set(dumped))
    for name in missing:
        print(f"{name}: FAIL no dump dir (Verify threw?)")
    for name in dumped:
        got = load_spark_result(outdir, name)
        if got is None:
            print(f"{name}: FAIL no parquet dump")
            continue
        if name not in oracles:
            print(f"{name}: SKIP (no oracle, rows={len(got)})")
            continue
        try:
            want = con.execute(oracles[name]).arrow().to_pandas()
        except Exception as e:
            print(f"{name}: FAIL oracle error: {e}")
            continue
        verdict = compare(name, got, want)
        if verdict == "OK":
            n_ok += 1
        print(f"{name}: {verdict}")
    print(f"== {n_ok}/{len(dumped) + len(missing)} hash-exact ==")


if __name__ == "__main__":
    main()
