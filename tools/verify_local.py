#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/verify_local.py [sfDir] [outDir]
  1. expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have been run
     (or runs it with --run)
  2. creates DuckDB views over the same parquet tables
  3. runs each oracle_sql.json query, compares to the Spark parquet output:
     row count, column names, and per-value hash (columns sorted by name,
     rows sorted by all columns) — strictest plausible interpretation.
"""
import sys, os, json, glob, subprocess, hashlib
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: decimals -> str, floats stay float64
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(lambda v: str(v) if v is not None else None)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def dfhash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for c in df.columns:
        h.update(c.encode())
        for v in df[c].tolist():
            h.update(repr(v).encode())
    return h.hexdigest()[:16]

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    if "--run" in sys.argv:
        r = subprocess.run(["sbt", "-error", f'runMain graft.Verify {sf} {out}'],
                           cwd="/root/repo")
        if r.returncode != 0:
            print("Verify run FAILED"); sys.exit(1)
    # --timeout SECS: per-oracle-query wall clock (0 = none). An oracle
    # that exceeds it is reported TIMEOUT and counted as a failure unless
    # also named in --skip (structurally DuckDB-infeasible at this SF,
    # e.g. the all-pairs dedup oracle at sf1).
    timeout = 0
    skip = {}
    only = None
    json_out = None
    for i, a in enumerate(sys.argv):
        if a == "--timeout":
            timeout = int(sys.argv[i + 1])
        if a == "--skip":  # name=reason,name=reason
            skip = dict(kv.split("=", 1) for kv in sys.argv[i + 1].split(","))
        if a == "--only":  # name,name — compare only these
            only = set(sys.argv[i + 1].split(","))
        if a == "--json":  # write per-query verdicts to this file
            json_out = sys.argv[i + 1]
    verdicts = {}
    con = duckdb.connect()
    # A runaway oracle (e.g. an all-pairs form at a scale SF) spills to
    # DuckDB's temp dir, which defaults to ./.tmp on the repo filesystem —
    # an uncapped spill once filled the disk and took down the concurrent
    # Spark dump. Cap it so an infeasible oracle fails fast with an IO
    # error (reported per-query below) instead of wedging the machine.
    con.execute("SET temp_directory='/tmp/duckdb_verify_spill'")
    # default stays the fail-fast 24GB; scale spot-gates that legitimately
    # need more (the 14-round unrolled CC oracle spills ~25GB at sf10)
    # raise it explicitly via DUCKDB_SPILL_CAP with disk headroom checked
    # by the operator
    con.execute(f"SET max_temp_directory_size='{os.environ.get('DUCKDB_SPILL_CAP', '24GB')}'")
    for t in TABLES:
        # driver testdata is one file per table; Spark-generated scale
        # dirs (Sf1Gen) are <table>.parquet/ directories of part files
        p = f"{sf}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    skipped = []
    # ops that crashed in Verify leave a <name>._error sidecar — surface
    # them as named failures, never as silent absence
    for err in sorted(glob.glob(f"{out}/*._error")):
        name = os.path.basename(err)[:-len("._error")]
        msg = open(err).read().strip().splitlines()
        print(f"  {name}: SPARK OP FAILED: {msg[0] if msg else '(no message)'}")
        n_fail += 1
    names = sorted(d for d in os.listdir(out) if os.path.isdir(os.path.join(out, d))
                   and not os.path.exists(os.path.join(out, d + "._error")))
    if only is not None:
        names = [n for n in names if n in only]
    for name in names:
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"  {name}: NO SPARK OUTPUT"); verdicts[name] = "NO_OUTPUT"; n_fail += 1; continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if name not in oracle:
            print(f"  {name}: rows-only ({len(spark_df)} rows) {'OK' if len(spark_df)>0 else 'EMPTY!'}")
            verdicts[name] = "ROWS_ONLY_OK" if len(spark_df) > 0 else "ROWS_ONLY_EMPTY"
            n_pass += int(len(spark_df) > 0); n_fail += int(len(spark_df) == 0)
            continue
        if name in skip:
            print(f"  {name}: SKIPPED ({skip[name]}) — spark rows={len(spark_df)} "
                  f"{'OK' if len(spark_df) > 0 else 'EMPTY!'}")
            skipped.append(name)
            verdicts[name] = f"SKIPPED: {skip[name]}" if len(spark_df) > 0 else "SKIPPED_BUT_EMPTY"
            n_fail += int(len(spark_df) == 0)
            continue
        try:
            if timeout:
                import threading
                timer = threading.Timer(timeout, con.interrupt)
                timer.start()
                try:
                    duck_df = con.execute(oracle[name]).fetchdf()
                finally:
                    timer.cancel()
            else:
                duck_df = con.execute(oracle[name]).fetchdf()
        except duckdb.InterruptException:
            print(f"  {name}: ORACLE TIMEOUT (> {timeout}s)"); verdicts[name] = "TIMEOUT"; n_fail += 1; continue
        except Exception as e:
            if "INTERRUPT" in str(e).upper():
                print(f"  {name}: ORACLE TIMEOUT (> {timeout}s)"); verdicts[name] = "TIMEOUT"; n_fail += 1; continue
            print(f"  {name}: ORACLE SQL ERROR: {e}"); verdicts[name] = f"ORACLE_ERROR: {e}"[:300]; n_fail += 1; continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"  {name}: COLUMN MISMATCH spark={list(a.columns)} duck={list(b.columns)}")
            verdicts[name] = "COLUMN_MISMATCH"; n_fail += 1; continue
        if len(a) != len(b):
            print(f"  {name}: ROWCOUNT MISMATCH spark={len(a)} duck={len(b)}")
            verdicts[name] = f"ROWCOUNT_MISMATCH {len(a)} vs {len(b)}"; n_fail += 1; continue
        ha, hb = dfhash(a), dfhash(b)
        if ha != hb:
            print(f"  {name}: HASH MISMATCH")
            diff = (a.astype(str) != b.astype(str))
            bad = diff.any(axis=1)
            print("   spark:", a[bad].head(3).to_dict("records"))
            print("   duck :", b[bad].head(3).to_dict("records"))
            verdicts[name] = "HASH_MISMATCH"; n_fail += 1; continue
        print(f"  {name}: OK ({len(a)} rows)")
        verdicts[name] = f"OK ({len(a)} rows)"
        n_pass += 1
    tail = f" / SKIPPED {len(skipped)} ({', '.join(skipped)})" if skipped else ""
    print(f"PASS {n_pass} / FAIL {n_fail}{tail}")
    if json_out:
        json.dump({"sf": sf, "out": out, "pass": n_pass, "fail": n_fail,
                   "skipped": skipped, "timeout_s": timeout,
                   "queries": verdicts}, open(json_out, "w"), indent=1)
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
