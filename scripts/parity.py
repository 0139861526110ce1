#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate: run DuckDB on
oracle_sql.json and compare against the Spark-written parquet results
(sort columns by name, sort rows, exact value compare)."""
import sys, os, glob, json
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        na_position="first")
    return df

def main(outdir, sfdir, json_out=None):
    import re, time
    t_start = time.time()
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    # 16GB default matches the driver's checker; the big amplified tiers
    # (100x/300x, where no Spark JVM holds RAM concurrently) override via
    # GRAFT_DUCK_MEM — round 12's only 100x "failure" was this cap, not
    # the engine (curation_pipeline hash-green at 48GB). The heavy
    # oracles carry their OWN re-settable `SET memory_limit` statements
    # (and the alphabetically-first oracle the session bounds), so the
    # override must rewrite those in-SQL caps too, not just the session
    # default — otherwise query 1 silently caps the session back.
    duck_mem = os.environ.get("GRAFT_DUCK_MEM", "16GB")
    if "GRAFT_DUCK_MEM" in os.environ:
        oracle = {k: re.sub(r"SET memory_limit\s*=\s*'[^']*'",
                            f"SET memory_limit='{duck_mem}'", v)
                  for k, v in oracle.items()}

    def fresh_connection():
        c = duckdb.connect()
        # bound DuckDB and give it somewhere to spill: the heavy iterated
        # oracles (pq_train's 4 Lloyd rounds) otherwise die with a
        # transient "bad allocation" when another JVM holds most of the
        # host's RAM — observed as a 1-in-4 pq_train flake on an
        # otherwise green registry
        c.sql("SET temp_directory='/tmp/duckdb_spill'")
        c.sql(f"SET memory_limit='{duck_mem}'")
        for t in TABLES:
            p = os.path.join(sfdir, f"{t}.parquet")
            if os.path.exists(p):
                c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        return c

    con = fresh_connection()
    n_pass = n_fail = 0
    report = {}

    def record(name, *, rows=None, schema=None, values=None,
               spark_rows=None, oracle_rows=None, err=None):
        report[name] = {"rows_match": rows, "schema_match": schema,
                        "hash_match": values, "spark_rows": spark_rows,
                        "oracle_rows": oracle_rows, "err": err}

    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = os.path.join(outdir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result at {res_dir}")
            record(name, err=f"no spark result at {res_dir}")
            n_fail += 1
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files],
                                 ignore_index=True)
            try:
                duck_df = con.sql(sql).df()
            except duckdb.OutOfMemoryException:
                # a hard OOM can poison the connection's buffer pool —
                # every later allocation then dies with "bad allocation"
                # (observed: one 100x OOM cascaded into 178 spurious
                # fails). Reconnect, then retry once minus any
                # temp_directory SET (DuckDB refuses it once the session
                # has spilled, which the failed attempt may just have
                # done on the old connection; the fresh one sets it
                # before any spill).
                con.close()
                con = fresh_connection()
                retry_sql = "\n".join(
                    l for l in sql.splitlines()
                    if not l.startswith("SET temp_directory"))
                duck_df = con.sql(retry_sql).df()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            record(name, err=f"{type(e).__name__}: {e}")
            n_fail += 1
            if "Out of Memory" in str(e) or isinstance(
                    e, duckdb.OutOfMemoryException):
                # don't let one genuine OOM poison every later query
                con.close()
                con = fresh_connection()
            continue
        s, d = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            record(name, rows=len(s) == len(d), schema=False,
                   spark_rows=len(s), oracle_rows=len(d))
            n_fail += 1
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            record(name, rows=False, schema=True,
                   spark_rows=len(s), oracle_rows=len(d))
            n_fail += 1
            continue
        # compare as strings to sidestep dtype differences (int32 vs int64)
        mism = (s.astype(str).values != d.astype(str).values)
        if mism.any():
            rows, cols = mism.nonzero()
            i, j = rows[0], cols[0]
            colname = s.columns[j]
            print(f"FAIL {name}: value mismatch at row {i} col {colname}: "
                  f"spark={s.iloc[i, j]!r} duck={d.iloc[i, j]!r}")
            # dtypes aid
            print(f"   dtypes spark={dict(spark_df.dtypes.astype(str))}")
            print(f"   dtypes duck ={dict(duck_df.dtypes.astype(str))}")
            record(name, rows=True, schema=True, values=False,
                   spark_rows=len(s), oracle_rows=len(d))
            n_fail += 1
            continue
        # strict dtype note (schema check may be stricter in driver)
        dt_s = dict(s.dtypes.astype(str))
        dt_d = dict(d.dtypes.astype(str))
        note = ""
        if dt_s != dt_d:
            diffs = {k: (dt_s[k], dt_d[k]) for k in dt_s if dt_s[k] != dt_d[k]}
            note = f"  [dtype diff: {diffs}]"
        print(f"PASS {name} ({len(s)} rows){note}")
        record(name, rows=True, schema=True, values=True,
               spark_rows=len(s), oracle_rows=len(d))
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    if json_out:
        meta = {"_meta": {"n_pass": n_pass, "n_fail": n_fail,
                          "outdir": outdir, "sfdir": sfdir,
                          "compare_sec": round(time.time() - t_start, 1)}}
        with open(json_out, "w") as f:
            json.dump({**meta, **report}, f, indent=2, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
