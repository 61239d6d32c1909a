#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: compare each
Verify-dumped parquet result against DuckDB running the matching oracle SQL
over the same sf parquet tables. Exact multiset comparison after sorting
columns by name and rows by value — stricter than any plausible driver
hash, so a pass here should pass the driver."""
import json, sys, math
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize for stable sort/compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            # list/array cells (numpy.ndarray is unhashable and unsortable)
            # -> tuples, so array-valued query results compare like scalars;
            # gate on ndim so numpy SCALARS (np.float64 in an object column,
            # whose tolist() is a bare scalar) pass through untouched
            df[c] = df[c].map(
                lambda v: tuple(v.tolist())
                if hasattr(v, "tolist") and getattr(v, "ndim", 0) > 0
                else (tuple(v) if isinstance(v, list) else v))
    df = df.sort_values(by=list(df.columns), ignore_index=True, kind="mergesort")
    return df

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 and sys.argv[3] else None
    if only is not None:
        unknown = only - set(oracle)
        if unknown:
            # a typo'd filter must not exit 0 as "0 pass / 0 fail"
            print(f"ERROR: unknown query name(s) in filter: {sorted(unknown)}")
            return 2
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only is not None and name not in only:
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.sql(sql).df()
            g, w = canon(got), canon(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
                n_fail += 1
                continue
            if len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
                n_fail += 1
                continue
            mismatch = None
            for c in g.columns:
                a, b = g[c], w[c]
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    af, bf = a.astype(float), b.astype(float)
                    eq = (af == bf) | (af.isna() & bf.isna())
                else:
                    eq = (a == b) | (a.isna() & b.isna())
                if not eq.all():
                    i = int((~eq).idxmax())
                    mismatch = (c, a.iloc[i], b.iloc[i], int((~eq).sum()))
                    break
            if mismatch:
                c, av, bv, n = mismatch
                print(f"FAIL {name}: col {c}: got {av!r} want {bv!r} ({n} diffs)")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(g)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    sys.exit(main(sf, out))
