#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/local_verify.py <outDir> <sfDir>
  <outDir>: directory written by `graft.Verify` (one parquet dir per query
            + oracle_sql.json)
  <sfDir>:  testdata dir (tables registered as DuckDB views)

For each query: load the Spark parquet result and the DuckDB oracle result,
sort columns by name, sort rows, compare values cell-by-cell (floats with
exact equality first, then 1e-9 rel tolerance reported separately).
"""
import sys, os, json, glob
import duckdb
import pandas as pd

def load_spark(outdir, name):
    files = sorted(glob.glob(os.path.join(outdir, name, "*.parquet")))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # array-typed cells (numpy arrays / lists) are unhashable and unsortable
    # in pandas — canonicalize them to their string form, which is also how
    # values end up compared (the driver's gate hashes rendered values)
    for c in df.columns:
        if df[c].dtype == object and df[c].map(
                lambda v: isinstance(v, (list, tuple)) or hasattr(v, "tolist")).any():
            df[c] = df[c].map(
                lambda v: str(list(v.tolist() if hasattr(v, "tolist") else v))
                if v is not None else None)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_ok = n_bad = n_close = 0
    for name in sorted(oracle):
        sql = oracle[name]
        got = load_spark(outdir, name)
        if got is None:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_bad += 1; continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: cols spark={list(g.columns)} oracle={list(e.columns)}")
            n_bad += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(e)}")
            n_bad += 1; continue
        # normalize dtypes (timestamps → str, categories → str)
        diff_cols = []
        close = True
        for c in g.columns:
            gv, ev = g[c], e[c]
            try:
                if str(gv.dtype).startswith("datetime") or str(ev.dtype).startswith("datetime"):
                    gv = gv.astype("datetime64[us]"); ev = ev.astype("datetime64[us]")
                eq = (gv.fillna("\0NULL") == ev.fillna("\0NULL")) if gv.dtype == object else \
                     ((gv == ev) | (gv.isna() & ev.isna()))
                if not eq.all():
                    import numpy as np
                    if gv.dtype.kind == 'f':
                        rel = np.abs(gv - ev) <= (1e-9 * np.maximum(np.abs(ev), 1.0))
                        rel = rel | (gv.isna() & ev.isna())
                        if rel.all():
                            diff_cols.append((c, "float-close"))
                            continue
                    bad_i = eq.idxmin()
                    diff_cols.append((c, f"row{bad_i}: spark={gv[bad_i]!r} oracle={ev[bad_i]!r}"))
                    close = False
            except Exception as ex:
                diff_cols.append((c, f"cmp-error {ex}")); close = False
        if not diff_cols:
            print(f"OK   {name} ({len(g)} rows)"); n_ok += 1
        elif close:
            print(f"CLOSE {name}: {diff_cols}"); n_close += 1
        else:
            print(f"FAIL {name}: {diff_cols}"); n_bad += 1
    print(f"\n{n_ok} ok, {n_close} float-close, {n_bad} fail")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
