#!/usr/bin/env python3
"""Dev-only local replica of the driver's correctness gate (NOT part of the
engine; the engine is pure Scala/Spark). Runs DuckDB on oracle_sql.json and
compares each query's dumped parquet against the oracle result: same schema
(sorted column names), same row count, same values (rows sorted by all
columns). Usage:
    python3 tools/verify_local.py <sfDir> <outDir>
after running:  sbt "runMain graft.Verify <sfDir> <outDir>"
"""
import sys, os, json, glob, shutil, tempfile
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), na_position="first",
                            kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    # Outsized-SF replays (sf10/sf100 replicas): without an explicit cap
    # DuckDB grows to 80% of physical RAM and coexists badly with the
    # Spark JVMs the same rehearsal runs — cap it and give it a spill
    # dir so heavy oracle queries degrade to disk instead of inviting
    # the OOM killer. Overridable for small-SF runs (where it never
    # matters anyway).
    limit = os.environ.get("GRAFT_DUCKDB_MEM", "48GB")
    con.execute(f"SET memory_limit='{limit}'")
    # Process-unique spill dir: DuckDB temp filenames are NOT
    # process-unique (duckdb_temp_storage-0.tmp, block ids from a fixed
    # base), so two concurrent verify_local.py instances sharing a spill
    # dir clobber each other's blocks — exactly the split-replay usage the
    # `only` arg enables. mkdtemp + cleanup at exit.
    spill = tempfile.mkdtemp(prefix="graft_duck_spill_")
    con.execute(f"SET temp_directory='{spill}'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written directory table (ScaleUp replicas)
            src = f"'{p}/*.parquet'"
        elif os.path.exists(p):
            src = f"'{p}'"
        else:
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
        if t == "events":
            # the engine's Common.tsUs seam, mirrored: ScaleUp replicas write
            # ts as BIGINT epoch-ns (driver testdata: TIMESTAMP) — floor to
            # micros so epoch_us(ts) in every oracle reads identically
            (dt,) = [r[1] for r in con.sql("DESCRIBE events").fetchall()
                     if r[0] == "ts"][:1] or ("",)
            if dt == "BIGINT":
                con.execute(
                    "CREATE OR REPLACE VIEW events AS SELECT * REPLACE "
                    f"(make_timestamp(ts // 1000) AS ts) FROM {src}")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    # Optional subset (comma-list of query names): lets an outsized-SF
    # replay split light and heavy oracles across instances.
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

    def check_one(name: str, d: str) -> str:
        files = glob.glob(os.path.join(d, "*.parquet"))
        got = pd.concat([pd.read_parquet(p) for p in files]) if files else pd.DataFrame()
        if name not in oracle:
            return f"NO-ORACLE rows={len(got)}"
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            return f"ORACLE-SQL-ERROR {e}"
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            return f"SCHEMA-MISMATCH got={list(g.columns)} exp={list(e.columns)}"
        # Type-strict: the driver's hash is representation-sensitive, so a
        # DuckDB HUGEINT (pandas float64/object) vs Spark int64 must FAIL
        # here too, even when every value is numerically equal (the exact
        # q74/q77 round-10/11 failure mode that check_dtype=False masked).
        # Computed only AFTER the schema check (identical column sets) and
        # on empty frames too — parquet/DuckDB columns carry dtypes at 0
        # rows.
        dt_bad = [c for c in g.columns
                  if str(g[c].dtype) != str(e[c].dtype)]
        if len(g) != len(e):
            return f"ROWCOUNT-MISMATCH got={len(g)} exp={len(e)}"
        if dt_bad:
            return "DTYPE-MISMATCH " + "; ".join(
                f"{c}: got={g[c].dtype} exp={e[c].dtype}" for c in dt_bad[:3])
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=True, check_exact=True)
            return f"OK rows={len(g)}"
        except AssertionError:
            neq = []
            for c in g.columns:
                a, b = g[c], e[c]
                bad = ~((a == b) | (a.isna() & b.isna()))
                if bad.any():
                    i = bad.idxmax()
                    neq.append(f"{c}[{i}]: got={a[i]!r} exp={b[i]!r} ({int(bad.sum())} diffs)")
            return "VALUE-MISMATCH " + "; ".join(neq[:3])

    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d) or (only is not None and name not in only):
            continue
        results[name] = check_one(name, d)
        # incremental progress line on EVERY terminal path — incl.
        # NO-ORACLE / ORACLE-SQL-ERROR / SCHEMA-MISMATCH (an hours-long
        # outsized-SF oracle that errors out must still bank its line);
        # the sorted summary below remains the record
        print(f"done {name}: {results[name]}", flush=True)
    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    n_no = sum(1 for v in results.values() if v.startswith("NO-ORACLE"))
    for k, v in sorted(results.items()):
        print(f"{'PASS' if v.startswith('OK') else 'INFO' if v.startswith('NO-ORACLE') else 'FAIL':5s} {k}: {v}")
    sys.stdout.flush()
    print(f"\n{n_ok} ok, {n_no} rows-only, {len(results) - n_ok - n_no} failed, {len(results)} total")
    shutil.rmtree(spill, ignore_errors=True)
    return 0 if n_ok + n_no == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
