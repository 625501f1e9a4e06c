#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare Verify output
parquet against the DuckDB oracle SQL, with columns sorted by name and rows
compared as sorted multisets (the driver hashes the same way)."""
import sys, os, json, glob
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(rows):
    def norm(v):
        if isinstance(v, float):
            return round(v, 9)
        return v
    # None-safe deterministic sort (None is not orderable vs str/int)
    return sorted((tuple(norm(v) for v in r) for r in rows),
                  key=lambda r: tuple((v is None, str(type(v)), str(v)) for v in r))

def dtypes(con, query):
    """{col: duckdb_type_name} for a query's output columns."""
    rows = con.execute(f"DESCRIBE {query}").fetchall()
    return {r[0]: r[1] for r in rows}

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        # driver tables are single files; Spark-written ones (e.g. the
        # ScaleUp sf1 set) are directories of part-files
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path += "/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    import time
    t0 = time.time()
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(qdir)
        if not os.path.isdir(qdir):
            continue
        # progress to stderr (flushed) — the sf0.1 quadratic oracles run
        # for minutes each and an opaque multi-hour run is undebuggable
        print(f"[verify {time.time()-t0:7.1f}s] {name}", file=sys.stderr, flush=True)
        got = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        got_cols = sorted(got.columns)
        sel = ", ".join(chr(34) + c + chr(34) for c in got_cols)
        got_rows = canon(con.execute(
            f"SELECT {sel} FROM (SELECT * FROM read_parquet(?))",
            [f"{qdir}/*.parquet"]).fetchall())
        if name not in oracle:
            results[name] = {"rows": len(got_rows), "oracle": "none (rows-only)", "ok": len(got_rows) > 0}
            continue
        try:
            exp = con.sql(oracle[name])
            exp_cols = sorted(exp.columns)
            exp_rows = canon(con.execute(
                f'SELECT {", ".join(chr(34)+c+chr(34) for c in exp_cols)} FROM ({oracle[name]})').fetchall())
        except Exception as e:
            results[name] = {"ok": False, "error": f"oracle failed: {e}"}
            continue
        # Output-dtype parity: the driver's hash distinguishes DuckDB's
        # HUGEINT/DECIMAL from Spark's BIGINT/DOUBLE even when every value
        # prints identically (p30 in r5, p53 in r7). canon() rounds floats,
        # so value comparison alone normalizes the difference away — compare
        # the declared output types of both sides explicitly.
        got_t = dtypes(con, f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        exp_t = dtypes(con, f"({oracle[name]})")
        dt_diff = {c: [got_t.get(c), exp_t.get(c)] for c in set(got_t) | set(exp_t)
                   if got_t.get(c) != exp_t.get(c)}
        ok_cols = got_cols == exp_cols
        ok_rows = len(got_rows) == len(exp_rows)
        ok_hash = got_rows == exp_rows
        ok_types = not dt_diff
        results[name] = {"cols": ok_cols, "nrows": ok_rows, "hash": ok_hash,
                         "types": ok_types,
                         "ok": ok_cols and ok_rows and ok_hash and ok_types}
        if dt_diff:
            results[name]["dtype_diff"] = dt_diff
        if not results[name]["ok"]:
            results[name]["got_cols"] = got_cols
            results[name]["exp_cols"] = exp_cols
            results[name]["got_n"] = len(got_rows)
            results[name]["exp_n"] = len(exp_rows)
            # first few differing rows
            diff_g = [r for r in got_rows if r not in exp_rows][:3]
            diff_e = [r for r in exp_rows if r not in got_rows][:3]
            results[name]["sample_got_only"] = [[str(v)[:60] for v in r] for r in diff_g]
            results[name]["sample_exp_only"] = [[str(v)[:60] for v in r] for r in diff_e]
    # A query that errored Spark-side writes no output dir — that's a FAIL,
    # not a skip (the driver's gate records it as missing/red).
    for name in oracle:
        if name not in results:
            results[name] = {"ok": False, "error": "no output dir (Spark-side failure?)"}
    npass = sum(1 for r in results.values() if r.get("ok"))
    ntotal = len(results)
    # tally INSIDE the object and the human-readable line on stderr: stdout
    # is redirected into the ORACLE_SF01_r{N}.json artifact, which must stay
    # a single json.load-able document (r11's trailing "PASS 149/149" line
    # broke every downstream parser)
    results["_pass"] = f"{npass}/{ntotal}"
    print(json.dumps(results, indent=1, default=str))
    print(f"PASS {npass}/{ntotal}", file=sys.stderr)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
