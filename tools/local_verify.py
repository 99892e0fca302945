#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/local_verify.py <outDir> <sfDir>
  <outDir>: directory written by `graft.Verify` (one parquet dir per query
            + oracle_sql.json)
  <sfDir>:  testdata dir (tables registered as DuckDB views)

FAITHFUL to the driver (round-7 rewrite): the driver sorts columns by
name, sorts rows via pandas, then hashes the RENDERED (stringified) cell
values — no numeric tolerance, no array canonicalization.  That means:
  * DuckDB sum(INT) -> HUGEINT -> pandas float64 renders "6.0" while a
    Spark bigint renders "6" -> hash MISMATCH (cast the oracle ::BIGINT).
  * An array-typed result column makes pandas sort_values crash
    ("unhashable type: numpy.ndarray") -> the query is recorded as err.
Both behaviors are reproduced here on purpose; the old version of this
tool tolerance-compared and canonicalized arrays, which reported 124/0
locally while the driver failed 3 (round-6 postmortem).

Per query prints OK/FAIL with rows_match/schema_match/hash_match; on a
hash mismatch, prints the first differing rendered cells for debugging
(diagnostic only — the verdict comes from the hash, like the driver).
"""
import sys, os, json, glob, hashlib, traceback
import duckdb
import pandas as pd

def load_spark(outdir, name):
    files = sorted(glob.glob(os.path.join(outdir, name, "*.parquet")))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)

def render(v):
    """Driver-style cell render: str() of the scalar, NULLs as a sentinel.
    No float rounding, no tolerance — exactly what the hash sees."""
    try:
        if v is None or pd.isna(v):
            return "\0NULL"
    except (TypeError, ValueError):
        pass  # arrays: pd.isna returns an array; they crash in sort anyway
    return str(v)

def canon(df):
    """Sort columns by name, rows by all columns (pandas sort — CRASHES on
    array cells, same as the driver's canonicalizer), render every cell."""
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamp resolution so ns-vs-us never shows in the render
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def rendered_rows(df):
    return ["\x1f".join(render(v) for v in row)
            for row in df.itertuples(index=False, name=None)]

def row_hash(rows):
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode("utf-8", "surrogatepass")); h.update(b"\x1e")
    return h.hexdigest()

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        sql = oracle[name]
        got = load_spark(outdir, name)
        if got is None:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_bad += 1; continue
        try:
            g, e = canon(got), canon(exp)
        except Exception:
            # the driver records this as err (e.g. unhashable numpy.ndarray
            # from an array-typed output column) — the query is effectively
            # untested, which counts as red
            print(f"FAIL {name}: canonicalize err "
                  f"{traceback.format_exc().strip().splitlines()[-1]}")
            n_bad += 1; continue
        rows_match = len(g) == len(e)
        schema_match = list(g.columns) == list(e.columns)
        if not schema_match:
            print(f"FAIL {name}: cols spark={list(g.columns)} oracle={list(e.columns)}")
            n_bad += 1; continue
        if not rows_match:
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(e)}")
            n_bad += 1; continue
        gr, er = rendered_rows(g), rendered_rows(e)
        if row_hash(gr) == row_hash(er):
            print(f"OK   {name} ({len(g)} rows)"); n_ok += 1
        else:
            # diagnostic: first differing rendered cell(s)
            diffs = []
            for i, (a, b) in enumerate(zip(gr, er)):
                if a != b:
                    ac, bc = a.split("\x1f"), b.split("\x1f")
                    for c, (x, y) in zip(g.columns, zip(ac, bc)):
                        if x != y:
                            diffs.append(f"row{i} {c}: spark={x!r} oracle={y!r}")
                    if len(diffs) >= 3:
                        break
            print(f"FAIL {name}: hash mismatch; {diffs[:3]}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
