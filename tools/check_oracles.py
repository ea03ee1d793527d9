"""Driver-style correctness sweep: run every queries() entry and compare
rows/schema/values against oracle_sql() via DuckDB.

    python tools/check_oracles.py [sf_dir]    # default /root/testdata/sf0.01

Mirrors the grading harness's comparison (sort columns by name, sort
rows, value-equality) so oracle regressions surface before a round
ends.  Exit code 1 on any failure."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb, pandas as pd, numpy as np, ray, pyarrow as pa

ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
import __ray_entry__ as em

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

qs = em.queries()
oracles = em.oracle_sql()
fails = []
for name, fn in qs.items():
    t0 = time.time()
    try:
        got = fn(SF)
        if hasattr(got, "to_pandas"):
            got = got.to_pandas()
        elif isinstance(got, pa.Table):
            got = got.to_pandas()
        nrows = len(got)
        if name in oracles:
            want = con.execute(oracles[name]).df()
            cols_g, cols_w = sorted(got.columns), sorted(want.columns)
            ok_schema = cols_g == cols_w
            ok_rows = len(got) == len(want)
            ok_vals = False
            if ok_schema and ok_rows:
                g = got[cols_g].sort_values(cols_g).reset_index(drop=True)
                w = want[cols_g].sort_values(cols_g).reset_index(drop=True)
                try:
                    pd.testing.assert_frame_equal(g, w, check_dtype=False)
                    ok_vals = True
                except AssertionError:
                    ok_vals = False
            status = "PASS" if (ok_schema and ok_rows and ok_vals) else "FAIL"
            if status == "FAIL":
                fails.append(name)
            print(f"{status} {name}: rows {len(got)}/{len(want)} schema={ok_schema} vals={ok_vals} {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
        else:
            print(f"ROWS {name}: {nrows} rows (no oracle) {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
    except Exception as e:
        fails.append(name)
        print(f"ERR  {name}: {type(e).__name__}: {e}", file=sys.stderr, flush=True)
print("FAILURES:", fails, file=sys.stderr)
ray.shutdown()
sys.exit(1 if fails else 0)
