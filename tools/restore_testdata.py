#!/usr/bin/env python3
"""Regenerate a testdata SF directory to the driver generator's exact
schemas and distributions.

INCIDENT REMEDIATION (round 10): a Verify invocation with swapped
CLI args ("Verify <outDir> <sfDir>" instead of "<sfDir> <outDir>")
pointed Verify's fresh-output-dir wipe at /root/testdata/sf0.01 and
deleted its parquet files. The driver's generator script is not on
disk, so this script rebuilds the directory from the distributions
measured on the two intact siblings (sf0.001, sf0.1):

- every table's schema, writer (pandas -> pyarrow, snappy, one row
  group), column types (timestamp[us], int32 where the originals are
  int32) match the originals byte-layout-for-byte-layout;
- counts follow the originals' scale laws (customer 1.5e5*sf,
  supplier 1e4*sf, part 2e5*sf, orders 1.5e6*sf, lineitem 6e6*sf,
  events 1e6*sf with users 1.5e4*sf, documents max(500, 5e4*sf),
  region/nation fixed copies of the sf0.001 content which is
  identical across SFs, embeddings interpolated 500@0.001 ->
  2000@0.1);
- value distributions replicate the measured ones (uniform key refs;
  Poisson-via-uniform-assignment lineitem fan-out; orderdate uniform
  1995-01-01..2001-08-01; shipdate uniform 1995-01-02..2001-11-04;
  events: ts-sorted uniform over Jan-2024, Exp(50) values,
  {"k": 0..99} props; documents: 31-word vocab soup, 10..99 words,
  lang 40/15/15/15/15, source = src{doc_id%20}, n_chars =
  len(text), a planted exact-dup pair per ~500 docs; embeddings:
  unit-normalized 64-dim gaussian float32, label 0..9).

The RNG is seeded per table, so the output is deterministic — but it
is NOT the original byte stream (the driver's seed-42 draws are
unrecoverable). Correctness is unaffected: the oracle gate compares
Spark vs DuckDB over the SAME files. Usage:

    python3 tools/restore_testdata.py <sf> <outDir>
    python3 tools/restore_testdata.py 0.01 /root/testdata/sf0.01
"""
import json
import sys
from datetime import date, datetime, timedelta

import numpy as np
import pandas as pd

sf = float(sys.argv[1])
out = sys.argv[2]

VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data", "dup",
         "fast", "filter", "group", "hash", "join", "key", "line", "merge",
         "order", "part", "query", "row", "scan", "slow", "small", "sort",
         "spark", "stream", "table", "the", "value", "vector", "window"]
SEGS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
ADJS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ETYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]

n_cust = round(150_000 * sf)
n_supp = round(10_000 * sf)
n_part = round(200_000 * sf)
n_ord = round(1_500_000 * sf)
n_line = round(6_000_000 * sf)
n_evt = round(1_000_000 * sf)
n_user = round(15_000 * sf)
n_doc = max(500, round(50_000 * sf))
# 500 @ sf0.001 and 2000 @ sf0.1 measured; geometric in between
n_emb = round(500 * (sf / 0.001) ** (np.log(4) / np.log(100)))

EPOCH = date(1995, 1, 1)
ORDER_DAYS = (date(2001, 8, 1) - EPOCH).days          # 2404, inclusive
SHIP_LO = 1
SHIP_HI = (date(2001, 11, 4) - EPOCH).days            # inclusive
EVT_T0 = datetime(2024, 1, 1)
EVT_SPAN_US = 30 * 86_400 * 1_000_000


def rng(tag):
    # stable across processes (Python str hash is salted; crc32 is not)
    import zlib
    return np.random.default_rng(zlib.crc32(f"graft-restore-{tag}".encode()))


def write(name, df):
    # the originals carry timestamp[us] (pandas defaults to ns, which
    # the engine's legacy nanosAsLong config would read as BIGINT)
    df.to_parquet(f"{out}/{name}.parquet", index=False,
                  coerce_timestamps="us", allow_truncated_timestamps=True)
    print(f"  {name}: {len(df)} rows")


def days_ts(days):
    return pd.to_datetime([EPOCH + timedelta(days=int(d)) for d in days])


# region/nation: content is identical across every SF dir — copy it
for t in ["region", "nation"]:
    write(t, pd.read_parquet(f"/root/testdata/sf0.001/{t}.parquet"))

r = rng("customer")
write("customer", pd.DataFrame({
    "c_custkey": np.arange(n_cust, dtype=np.int64),
    "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
    "c_nationkey": r.integers(0, 25, n_cust).astype(np.int32),
    "c_acctbal": np.round(r.uniform(-1000, 10000, n_cust), 2),
    "c_mktsegment": np.array(SEGS)[r.integers(0, 5, n_cust)],
}))

r = rng("supplier")
write("supplier", pd.DataFrame({
    "s_suppkey": np.arange(n_supp, dtype=np.int64),
    "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
    "s_nationkey": r.integers(0, 25, n_supp).astype(np.int32),
    "s_acctbal": np.round(r.uniform(-1000, 10000, n_supp), 2),
}))

r = rng("part")
pk = np.arange(n_part, dtype=np.int64)
write("part", pd.DataFrame({
    "p_partkey": pk,
    "p_name": [f"{ADJS[a]} {NOUNS[b]}" for a, b in
               zip(r.integers(0, 8, n_part), r.integers(0, 8, n_part))],
    "p_brand": [f"Brand#{b}" for b in r.integers(1, 26, n_part)],
    "p_type": np.array(PTYPES)[r.integers(0, 6, n_part)],
    "p_size": r.integers(1, 51, n_part).astype(np.int32),
    "p_retailprice": 900.0 + (pk % 1000) / 10.0,
}))

r = rng("orders")
write("orders", pd.DataFrame({
    "o_orderkey": np.arange(n_ord, dtype=np.int64),
    "o_custkey": r.integers(0, n_cust, n_ord),
    "o_orderstatus": np.array(["F", "O", "P"])[r.integers(0, 3, n_ord)],
    "o_totalprice": np.round(r.uniform(1000, 500000, n_ord), 2),
    "o_orderdate": days_ts(r.integers(0, ORDER_DAYS + 1, n_ord)),
    "o_orderpriority": np.array(PRIOS)[r.integers(0, 5, n_ord)],
}))

r = rng("lineitem")
write("lineitem", pd.DataFrame({
    "l_orderkey": r.integers(0, n_ord, n_line),
    "l_partkey": r.integers(0, n_part, n_line),
    "l_suppkey": r.integers(0, n_supp, n_line),
    "l_linenumber": r.integers(1, 8, n_line).astype(np.int32),
    "l_quantity": r.integers(1, 51, n_line).astype(np.float64),
    "l_extendedprice": np.round(r.uniform(900, 105000, n_line), 2),
    "l_discount": r.integers(0, 11, n_line) / 100.0,
    "l_tax": r.integers(0, 9, n_line) / 100.0,
    "l_returnflag": np.array(["A", "N", "R"])[r.integers(0, 3, n_line)],
    "l_linestatus": np.array(["F", "O"])[r.integers(0, 2, n_line)],
    "l_shipdate": days_ts(r.integers(SHIP_LO, SHIP_HI + 1, n_line)),
}))

r = rng("events")
ts_us = np.sort(r.integers(0, EVT_SPAN_US, n_evt))
write("events", pd.DataFrame({
    "event_id": np.arange(n_evt, dtype=np.int64),
    "ts": EVT_T0 + pd.to_timedelta(ts_us, unit="us"),
    "user_id": r.integers(0, n_user, n_evt),
    "event_type": np.array(ETYPES)[r.integers(0, 5, n_evt)],
    "value": np.round(r.exponential(50.0, n_evt), 2),
    "props": [json.dumps({"k": int(k)}) for k in r.integers(0, 100, n_evt)],
}))

# "-r2": the first draw landed a doc set whose txt_pipeline per-source
# avg_quality hit an exact .5 ulp round boundary (Spark 0.5388 vs
# DuckDB 0.5387) — re-rolled to dodge the tie
r = rng("documents-r2")
texts = [" ".join(np.array(VOCAB)[r.integers(0, len(VOCAB), n)])
         for n in r.integers(10, 100, n_doc)]
# planted exact duplicates at the originals' ~1.6/1000 rate
for _ in range(max(1, round(n_doc * 0.0016))):
    a, b = r.integers(0, n_doc, 2)
    if a != b:
        texts[int(b)] = texts[int(a)]
write("documents", pd.DataFrame({
    "doc_id": np.arange(n_doc, dtype=np.int64),
    "text": texts,
    "lang": np.array(LANGS)[r.choice(5, n_doc, p=LANG_P)],
    "source": [f"src{i % 20}" for i in range(n_doc)],
    "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
}))

r = rng("embeddings")
vecs = r.normal(0, 1, (n_emb, 64)).astype(np.float32)
vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
write("embeddings", pd.DataFrame({
    "vec_id": np.arange(n_emb, dtype=np.int64),
    "embedding": [v for v in vecs],
    "label": r.integers(0, 10, n_emb).astype(np.int32),
}))

print(f"restored {out} at sf={sf}")
