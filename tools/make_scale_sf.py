#!/usr/bin/env python3
"""Derive a larger scale factor from the driver's testdata for scale probes.

Local measurement tooling only (like local_verify.py) — the engine itself
never runs Python. Replication follows the driver's own per-table scaling
pattern (TESTDATA.md counts across sf0.001/0.01/0.1):

  - region/nation: fixed dims, copied once
  - customer/supplier/part/orders/lineitem/events: x FACTOR, every key
    column shifted by replica * (its own family's stride) so FK joins stay
    consistent and key cardinality actually grows
  - documents: x FACTOR, replica > 0 gets a per-replica suffix appended to
    EVERY token, so cross-replica shingle Jaccard is ~0 -- a naive text
    clone would turn the dedup family quadratic in replicas (every doc
    near-dup with its 9 clones), which a genuinely larger corpus is not
  - embeddings: x EMB_FACTOR (the driver steps embeddings x4 per decade,
    not x10), replica > 0 perturbed with deterministic per-dim noise so
    there are no bit-identical clones

Key strides are COMPUTED PER KEY FAMILY from the source (max(key)+1, one
stride shared by a key and every FK that references it), not a global
constant: the driver's testdata keys are DENSE 0..N-1 at every SF, and
engine fixtures legitimately rely on that (cat_token_scan probes the
median key `count(*)/2`, which must exist). A global 10M stride left the
scaled keyspace sparse — the round-15 sf100 run's cat_token_scan failure
("head of empty array") was exactly that missing median row. Computed
strides keep every hop dense (dense in -> dense out), so chaining decades
(sf0.1 -> sf10 -> sf100) needs no stride bookkeeping at all.

c_name gets a per-replica suffix for r > 0: customer names map 1:1 to
keys in the driver's data (the token-index fixture probes a name token
and expects exactly the probed row back); a verbatim clone would give
every name FACTOR duplicates and quietly turn the token-pruned point
probe into a FACTOR-row scan. The suffix's chars ([A-Za-z0-9_]) keep it
inside ONE token under Catalog.TokenSeparators, so the probe token stays
unique. r=0 rows stay byte-identical for every table.

Usage: make_scale_sf.py SRC_DIR OUT_DIR [FACTOR=10] [EMB_FACTOR=4]
"""
import sys, os
import duckdb

src = sys.argv[1]
out = sys.argv[2]
factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
emb_factor = int(sys.argv[4]) if len(sys.argv) > 4 else 4

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

def stride(table, key):
    # one stride per key FAMILY (a key and its FKs shift together); max+1
    # keeps dense sources dense and guarantees no replica collision even
    # on a sparse one
    return con.execute(f"SELECT max({key}) + 1 FROM {t(table)}").fetchone()[0]

CUST = stride("customer", "c_custkey")
SUPP = stride("supplier", "s_suppkey")
PART = stride("part", "p_partkey")
ORD = stride("orders", "o_orderkey")
EVT = stride("events", "event_id")
USR = stride("events", "user_id")
DOC = stride("documents", "doc_id")
VEC = stride("embeddings", "vec_id")
print(f"strides: cust={CUST} supp={SUPP} part={PART} ord={ORD} "
      f"evt={EVT} usr={USR} doc={DOC} vec={VEC}")

R = f"CROSS JOIN range(0, {factor}) rep(r)"

copy(f"SELECT * FROM {t('region')}", "region")
copy(f"SELECT * FROM {t('nation')}", "nation")
copy(f"""SELECT c_custkey + r*{CUST} AS c_custkey,
          c_name || CASE WHEN r = 0 THEN '' ELSE '_r' || r END AS c_name,
          c_nationkey, c_acctbal, c_mktsegment
          FROM {t('customer')} {R}""", "customer", multi=True)
copy(f"""SELECT s_suppkey + r*{SUPP} AS s_suppkey, s_name, s_nationkey,
          s_acctbal FROM {t('supplier')} {R}""", "supplier", multi=True)
copy(f"""SELECT p_partkey + r*{PART} AS p_partkey, p_name, p_brand, p_type,
          p_size, p_retailprice FROM {t('part')} {R}""", "part", multi=True)
copy(f"""SELECT o_orderkey + r*{ORD} AS o_orderkey,
          o_custkey + r*{CUST} AS o_custkey, o_orderstatus, o_totalprice,
          o_orderdate, o_orderpriority FROM {t('orders')} {R}""", "orders", multi=True)
copy(f"""SELECT l_orderkey + r*{ORD} AS l_orderkey,
          l_partkey + r*{PART} AS l_partkey,
          l_suppkey + r*{SUPP} AS l_suppkey,
          l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
          l_returnflag, l_linestatus, l_shipdate FROM {t('lineitem')} {R}""", "lineitem", multi=True)
copy(f"""SELECT event_id + r*{EVT} AS event_id, ts,
          user_id + r*{USR} AS user_id, event_type, value, props
          FROM {t('events')} {R}""", "events", multi=True)
copy(f"""SELECT doc_id + r*{DOC} AS doc_id,
          CASE WHEN r = 0 THEN text
               ELSE array_to_string(
                      list_transform(string_split(text, ' '), w -> w || '~q' || r),
                      ' ') END AS text,
          lang, source, n_chars FROM {t('documents')} {R}""", "documents", multi=True)
copy(f"""SELECT vec_id + r*{VEC} AS vec_id,
          CASE WHEN r = 0 THEN embedding
               ELSE list_transform(generate_series(1, len(embedding)),
                      i -> (embedding[i]
                            + 0.05*sin(((vec_id + r*{VEC}) % 101 + 1) * i * 0.7))::FLOAT)
          END AS embedding, label
          FROM {t('embeddings')} CROSS JOIN range(0, {emb_factor}) rep(r)""", "embeddings")
print("done:", out)
