#!/usr/bin/env python3
"""Local replica of the driver's correctness loop: read each query's
parquet dump (written by graft.Verify), run the corresponding oracle SQL
from oracle_sql.json in DuckDB over the same testdata tables, and compare
schema (column names) + row multiset. Exact comparison; floats compared
bit-exactly first, with a 1e-12 relative fallback reported separately."""
import sys, json, math
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa
from pathlib import Path

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bool):
        return str(v)
    return str(v)

def rows_of(cols, names):
    order = sorted(range(len(names)), key=lambda i: names[i])
    out = []
    n = len(cols[0]) if cols else 0
    for r in range(n):
        out.append(tuple(norm_cell(cols[i][r]) for i in order))
    out.sort()
    return out

def approx_equal(a, b):
    try:
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    except (ValueError, TypeError):
        return a == b

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.loads(Path(outdir, "oracle_sql.json").read_text())
    n_pass = n_fail = n_nooracle = 0
    for qdir in sorted(Path(outdir).iterdir()):
        if not qdir.is_dir():
            continue
        name = qdir.name
        tbl = pq.read_table(qdir)
        if name not in oracle:
            n_nooracle += 1
            print(f"  (no-oracle) {name}: {tbl.num_rows} rows")
            continue
        # Round 7 (per verdict): the DRIVER's pandas compare crashes on
        # nested cells (sort_values -> factorize on numpy.ndarray), while
        # this replica's str() fallback silently stringifies them — the
        # exact divergence that let round 6's text_inverted_index ship
        # red. Fail fast here so an array/struct/map output column in an
        # ORACLED key dies in the builder loop, not in the round artifact.
        nested = [f.name for f in tbl.schema
                  if pa.types.is_nested(f.type)]
        if nested:
            print(f"FAIL {name}: non-scalar output column(s) {nested} — "
                  f"the driver's pandas compare cannot hash these")
            n_fail += 1
            continue
        try:
            res = con.execute(oracle[name])
            dnames = [d[0] for d in res.description]
            dcols = list(zip(*res.fetchall()))
            if not dcols:
                dcols = [[] for _ in dnames]
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        snames = tbl.column_names
        scols = [tbl.column(c).to_pylist() for c in snames]
        if sorted(snames) != sorted(dnames):
            print(f"FAIL {name}: columns spark={sorted(snames)} duck={sorted(dnames)}")
            n_fail += 1
            continue
        srows = rows_of(scols, snames)
        drows = rows_of(dcols, dnames)
        if srows == drows:
            print(f"PASS {name}: {len(srows)} rows")
            n_pass += 1
            continue
        # detailed diff
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
        else:
            bad = [(a, b) for a, b in zip(srows, drows) if a != b]
            napprox = sum(1 for a, b in bad
                          if all(approx_equal(x, y) for x, y in zip(a, b)))
            print(f"FAIL {name}: {len(bad)}/{len(srows)} rows differ "
                  f"({napprox} only-float-noise)")
            for a, b in bad[:3]:
                print(f"    spark={a}\n    duck ={b}")
        n_fail += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_nooracle} no-oracle ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
