#!/usr/bin/env python3
"""One-command DuckDB oracle sweep (verification harness, not library code).

Reproduces the driver's correctness gate at any scale factor: runs
`graft.Verify` (unless --skip-verify), then replays every entry of
`oracle_sql.json` in DuckDB against the same parquet tables and
compares rows / schema / values, writing a CORRECTNESS-style JSON with
per-query oracle timing. Background-friendly: progress goes to stderr,
one JSON artifact at the end.

Usage:
  python3 scripts/oracle_sweep.py --sf /root/testdata/sf0.1 \
      [--verify-dir /tmp/verify_sf0.1] [--out CORRECTNESS_local.json] \
      [--skip-verify] [--queries q_curate,q_span_dedup]

The sf0.1 sweep takes ~45-60 min: most oracles are cheap but the
pairwise-similarity replays (q_jaccard_pairs, q_neardup_survivors,
q_curate_neardup, q_cosine_pairs, q_ann_*) are quadratic by design.
"""
import argparse, json, os, subprocess, sys, time

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def compare(con, verify_dir, name, sql):
    import pandas as pd
    got = con.execute(
        f"SELECT * FROM read_parquet('{verify_dir}/{name}/*.parquet')").df()
    t0 = time.time()
    want = con.execute(sql).df()
    oracle_secs = time.time() - t0
    cols_g, cols_w = sorted(got.columns), sorted(want.columns)
    schema_match = cols_g == cols_w
    rows_match = len(got) == len(want)
    value_match = False
    if schema_match and rows_match:
        g = got.reindex(cols_g, axis=1)
        w = want.reindex(cols_w, axis=1)
        # driver compares values, not dtype width: fold int32/int64 and
        # DuckDB HUGEINT sums to one integer dtype before comparing
        for c in cols_g:
            for df in (g, w):
                dt = df[c].dtype
                try:
                    if pd.api.types.is_integer_dtype(dt):
                        df[c] = df[c].astype("int64")
                    elif dt == object and df[c].map(
                            lambda v: isinstance(v, int), na_action="ignore").all():
                        df[c] = df[c].astype("int64")
                except (TypeError, ValueError, OverflowError):
                    pass
        g = g.sort_values(by=cols_g).reset_index(drop=True)
        w = w.sort_values(by=cols_w).reset_index(drop=True)
        value_match = g.equals(w)
    return {
        "rows_match": rows_match,
        "schema_match": schema_match,
        "hash_match": value_match,
        "spark_rows": int(len(got)),
        "oracle_rows": int(len(want)),
        "oracle_secs": round(oracle_secs, 2),
        "err": None,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", required=True, help="testdata dir, e.g. /root/testdata/sf0.1")
    ap.add_argument("--verify-dir", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--skip-verify", action="store_true",
                    help="reuse an existing --verify-dir dump")
    ap.add_argument("--queries", default=None, help="comma-separated subset")
    args = ap.parse_args()

    sf_name = os.path.basename(args.sf.rstrip("/"))
    verify_dir = args.verify_dir or f"/tmp/verify_{sf_name}"
    out = args.out or f"CORRECTNESS_local_{sf_name}.json"

    if not args.skip_verify:
        log(f"[sweep] sbt runMain graft.Verify {args.sf} {verify_dir}")
        r = subprocess.run(
            ["sbt", "-batch", f"runMain graft.Verify {args.sf} {verify_dir}"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        if r.returncode != 0:
            log(f"[sweep] Verify failed rc={r.returncode}")
            sys.exit(1)

    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')")
    oracle = json.load(open(f"{verify_dir}/oracle_sql.json"))
    subset = None
    if args.queries:
        subset = {q.strip() for q in args.queries.split(",") if q.strip()}
        unknown = subset - set(oracle)
        if unknown:
            log(f"[sweep] unknown queries (not in oracle_sql.json): {sorted(unknown)}")
            sys.exit(1)

    results, n_bad = {}, 0
    for name in sorted(oracle):
        if subset and name not in subset:
            continue
        t0 = time.time()
        try:
            results[name] = compare(con, verify_dir, name, oracle[name])
        except Exception as e:
            results[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": None,
                             "oracle_rows": None,
                             "oracle_secs": round(time.time() - t0, 2),
                             "err": f"{type(e).__name__}: {str(e)[:200]}"}
        r = results[name]
        ok = r["hash_match"] is True
        n_bad += 0 if ok else 1
        log(f"[sweep] {name}: {'ok' if ok else 'FAIL ' + str(r)[:160]} "
            f"({r['oracle_secs']}s, rows={r['spark_rows']})")

    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    n = len(results)
    log(f"[sweep] done: {n - n_bad}/{n} green -> {out}")
    sys.exit(0 if n_bad == 0 else 2)


if __name__ == "__main__":
    main()
