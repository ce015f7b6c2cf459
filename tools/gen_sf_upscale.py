"""Generate a larger measurement dataset with the same schema and
empirical distributions as the driver's /root/testdata/sf* tables.

The driver's round-end bench may run at a bigger scale factor than the
shipped test data (BENCH_r05.json: sf=1.0), so optimization A/Bs need a
local dataset of that size. This generator reproduces the *shape* of the
driver data (schemas, key ranges x scale, vocabulary, value ranges, row
group layout: pyarrow defaults, snappy) from distributions measured on
sf0.1 — it is NOT byte-identical to driver data and lives outside
/root/testdata (which is read-only by contract).

Usage: python tools/gen_sf_upscale.py <scale> <outdir>
  scale: multiplier vs sf0.1 (10 -> "sf1.0"-sized)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ['a', 'agg', 'batch', 'big', 'column', 'customer', 'data', 'dup',
         'fast', 'filter', 'group', 'hash', 'join', 'key', 'line', 'merge',
         'order', 'part', 'query', 'row', 'scan', 'slow', 'small', 'sort',
         'spark', 'stream', 'table', 'the', 'value', 'vector', 'window']
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
EPOCH_US = np.datetime64("1970-01-01")


def _ts_us(days_float):
    return (days_float * 86_400_000_000).astype("int64").astype(
        "datetime64[us]")


def write(outdir, name, table):
    pq.write_table(table, os.path.join(outdir, f"{name}.parquet"),
                   compression="snappy")
    print(f"{name}: {table.num_rows} rows")


def main(scale: float, outdir: str):
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(4242)

    n_cust = int(15_000 * scale)
    n_part = int(20_000 * scale)
    n_supp = int(1_000 * scale)
    n_ord = int(150_000 * scale)
    n_li = int(600_000 * scale)
    n_ev = int(100_000 * scale)
    n_users = int(1_500 * scale)
    n_doc = int(5_000 * scale)
    n_emb = int(2_000 * (4 ** np.log10(scale)))  # 500/2k per decade -> 8k

    # region / nation (fixed dims)
    write(outdir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]}))
    write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())}))

    # customer
    ck = np.arange(n_cust, dtype=np.int64)
    write(outdir, "customer", pa.table({
        "c_custkey": ck,
        "c_name": [f"Customer#{i:09d}" for i in ck],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10_000, n_cust), 2),
        "c_mktsegment": np.array(["MACHINERY", "AUTOMOBILE", "HOUSEHOLD",
                                  "BUILDING", "FURNITURE"])[
            rng.integers(0, 5, n_cust)]}))

    # supplier
    sk = np.arange(n_supp, dtype=np.int64)
    write(outdir, "supplier", pa.table({
        "s_suppkey": sk,
        "s_name": [f"Supplier#{i:09d}" for i in sk],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10_000, n_supp), 2)}))

    # part
    pk = np.arange(n_part, dtype=np.int64)
    adj = ["large", "hot", "small", "cold", "shiny", "dull", "new", "old"]
    noun = ["ring", "bolt", "nut", "washer", "gear", "pin"]
    write(outdir, "part", pa.table({
        "p_partkey": pk,
        "p_name": [f"{adj[i % 8]} {noun[(i // 8) % 6]}" for i in pk],
        "p_brand": [f"Brand#{11 + (i % 5) * 11 % 45}" for i in pk],
        "p_type": [f"TYPE{i % 6}" for i in pk],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2)}))

    # orders: orderdate uniform 1995-01-01..2001-08-01
    ok = np.arange(n_ord, dtype=np.int64)
    d0 = (np.datetime64("1995-01-01") - EPOCH_US).astype(
        "timedelta64[D]").astype(float)
    span = 2404.0  # days to 2001-08-01
    odate_days = d0 + rng.integers(0, int(span) + 1, n_ord).astype(float)
    write(outdir, "orders", pa.table({
        "o_orderkey": ok,
        "o_custkey": rng.integers(0, n_cust, n_ord).astype(np.int64),
        "o_orderstatus": np.array(["P", "O", "F"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": _ts_us(odate_days),
        "o_orderpriority": np.array(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])[
            rng.integers(0, 5, n_ord)]}))

    # lineitem: each line draws a uniform orderkey (Poisson lines/order)
    lok = np.sort(rng.integers(0, n_ord, n_li).astype(np.int64))
    ship_days = odate_days[lok] + rng.integers(1, 96, n_li).astype(float)
    write(outdir, "lineitem", pa.table({
        "l_orderkey": lok,
        "l_partkey": rng.integers(0, n_part, n_li).astype(np.int64),
        "l_suppkey": rng.integers(0, n_supp, n_li).astype(np.int64),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": np.array(["N", "R", "A"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
        "l_shipdate": _ts_us(ship_days)}))

    # events: 30-day window, uniform users/types
    ev_day0 = (np.datetime64("2024-01-01") - EPOCH_US).astype(
        "timedelta64[D]").astype(float)
    ev_days = ev_day0 + np.sort(rng.uniform(0, 30, n_ev))
    kvals = rng.integers(0, 100, n_ev)
    write(outdir, "events", pa.table({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": _ts_us(ev_days),
        "user_id": rng.integers(0, n_users, n_ev).astype(np.int64),
        "event_type": np.array(["signup", "purchase", "view", "click",
                                "error"])[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.uniform(0, 561, n_ev) *
                          rng.uniform(0, 1, n_ev), 2),
        "props": [json.dumps({"k": int(k)}) for k in kvals]}))

    # documents: word salads from the 31-word vocab, uniform 10..100 words
    lens = rng.integers(10, 101, n_doc)
    widx = rng.integers(0, len(VOCAB), int(lens.sum()))
    texts = []
    pos = 0
    for ln in lens:
        texts.append(" ".join(VOCAB[w] for w in widx[pos:pos + ln]))
        pos += ln
    # plant ~0.16% exact duplicates (sf0.1 had 8/5000)
    n_dup = max(1, int(0.0016 * n_doc))
    dup_dst = rng.choice(n_doc, n_dup, replace=False)
    dup_src = rng.choice(n_doc, n_dup, replace=False)
    for a, b in zip(dup_dst, dup_src):
        texts[a] = texts[b]
    write(outdir, "documents", pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)],
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": np.array([len(t) for t in texts], np.int64)}))

    # embeddings: 64-dim unit-ish vectors clustered by label
    centers = rng.normal(0, 1, (10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    vecs = centers[labels] * 0.7 + rng.normal(0, 0.35, (n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    write(outdir, "embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(list(vecs.astype(np.float32))),
        "label": pa.array(labels, pa.int32())}))

    with open(os.path.join(outdir, "_DONE"), "w") as f:
        f.write("gen_sf_upscale\n")


if __name__ == "__main__":
    main(float(sys.argv[1]), sys.argv[2])
