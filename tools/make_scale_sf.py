#!/usr/bin/env python3
"""Derive a larger scale factor from the driver's testdata for scale probes.

Local measurement tooling only (like local_verify.py) — the engine itself
never runs Python. Replication follows the driver's own per-table scaling
pattern (TESTDATA.md counts across sf0.001/0.01/0.1):

  - region/nation: fixed dims, copied once
  - customer/supplier/part/orders/lineitem/events: x FACTOR, every key
    column shifted by replica*STRIDE so FK joins stay consistent and key
    cardinality actually grows
  - documents: x FACTOR, replica > 0 gets a per-replica suffix appended to
    EVERY token, so cross-replica shingle Jaccard is ~0 -- a naive text
    clone would turn the dedup family quadratic in replicas (every doc
    near-dup with its 9 clones), which a genuinely larger corpus is not
  - embeddings: x EMB_FACTOR (the driver steps embeddings x4 per decade,
    not x10), replica > 0 perturbed with deterministic per-dim noise so
    there are no bit-identical clones

Usage: make_scale_sf.py SRC_DIR OUT_DIR [FACTOR=10] [EMB_FACTOR=4] [STRIDE=10000000]
"""
import sys, os
import duckdb

src = sys.argv[1]
out = sys.argv[2]
factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
emb_factor = int(sys.argv[4]) if len(sys.argv) > 4 else 4
# key shift per replica: must exceed the SOURCE's max key, or replica
# keys collide. Chaining decades (sf0.1 -> sf10 -> sf100) grows keys by
# x(factor) per hop, so the stride is an argument: default suits a
# first hop from driver testdata; pass a larger one when re-scaling an
# already-scaled dir (e.g. 10_000_000_000 for sf10 -> sf100).
STRIDE = int(sys.argv[5]) if len(sys.argv) > 5 else 10_000_000

os.makedirs(out, exist_ok=True)
con = duckdb.connect()

def copy(sql, name, multi=False):
    # multi-file output for the scaled fact tables: a single giant file
    # caps Spark's scan parallelism at size/maxPartitionBytes splits of
    # one file — unrepresentative of any real warehouse layout and it
    # skews scan-bound queries superlinear in the probe. One file per
    # replica (the cross-join COPY pipeline is single-threaded in DuckDB,
    # so PER_THREAD_OUTPUT would still emit one file).
    if multi:
        d = f"{out}/{name}.parquet"
        os.makedirs(d, exist_ok=True)
        tagged = sql.replace("SELECT", "SELECT r AS __r,", 1)
        for rep in range(factor):
            con.execute(
                f"COPY (SELECT * EXCLUDE (__r) FROM ({tagged}) q WHERE q.__r = {rep}) "
                f"TO '{d}/part_{rep:04d}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
    else:
        con.execute(f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{out}/{name}.parquet'").fetchone()[0]
    print(f"{name}: {n} rows")

def t(name):
    # driver testdata tables are single files; this tool's own multi-file
    # output (and any real warehouse) is a directory of part files
    p = f"{src}/{name}.parquet"
    return f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"

R = f"CROSS JOIN range(0, {factor}) rep(r)"

copy(f"SELECT * FROM {t('region')}", "region")
copy(f"SELECT * FROM {t('nation')}", "nation")
copy(f"""SELECT c_custkey + r*{STRIDE} AS c_custkey, c_name, c_nationkey,
          c_acctbal, c_mktsegment FROM {t('customer')} {R}""", "customer", multi=True)
copy(f"""SELECT s_suppkey + r*{STRIDE} AS s_suppkey, s_name, s_nationkey,
          s_acctbal FROM {t('supplier')} {R}""", "supplier", multi=True)
copy(f"""SELECT p_partkey + r*{STRIDE} AS p_partkey, p_name, p_brand, p_type,
          p_size, p_retailprice FROM {t('part')} {R}""", "part", multi=True)
copy(f"""SELECT o_orderkey + r*{STRIDE} AS o_orderkey,
          o_custkey + r*{STRIDE} AS o_custkey, o_orderstatus, o_totalprice,
          o_orderdate, o_orderpriority FROM {t('orders')} {R}""", "orders", multi=True)
copy(f"""SELECT l_orderkey + r*{STRIDE} AS l_orderkey,
          l_partkey + r*{STRIDE} AS l_partkey,
          l_suppkey + r*{STRIDE} AS l_suppkey,
          l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
          l_returnflag, l_linestatus, l_shipdate FROM {t('lineitem')} {R}""", "lineitem", multi=True)
copy(f"""SELECT event_id + r*{STRIDE} AS event_id, ts,
          user_id + r*{STRIDE} AS user_id, event_type, value, props
          FROM {t('events')} {R}""", "events", multi=True)
copy(f"""SELECT doc_id + r*{STRIDE} AS doc_id,
          CASE WHEN r = 0 THEN text
               ELSE array_to_string(
                      list_transform(string_split(text, ' '), w -> w || '~q' || r),
                      ' ') END AS text,
          lang, source, n_chars FROM {t('documents')} {R}""", "documents", multi=True)
copy(f"""SELECT vec_id + r*{STRIDE} AS vec_id,
          CASE WHEN r = 0 THEN embedding
               ELSE list_transform(generate_series(1, len(embedding)),
                      i -> (embedding[i]
                            + 0.05*sin(((vec_id + r*{STRIDE}) % 101 + 1) * i * 0.7))::FLOAT)
          END AS embedding, label
          FROM {t('embeddings')} CROSS JOIN range(0, {emb_factor}) rep(r)""", "embeddings")
print("done:", out)
