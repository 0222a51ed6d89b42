#!/usr/bin/env python3
"""Generate an sfN-shaped synthetic dataset for SCALING measurements.

The driver ships read-only sf0.001/0.01/0.1 under /root/testdata; the
scaling curve (SCALING.md) needs one more decade. This generator mirrors
the driver tables' schemas and summary statistics (profiled from the
sf-series: row-count ratios, key cardinalities, the 31-word document
vocabulary, 10-100 words/doc, ~0.2% exact-dup rate, 64-dim embeddings in
10 label clusters, 30-day event window with ~67 events/user) so per-query
runtimes are comparable across decades. It is distribution-APPROXIMATE —
good for time-vs-rows slopes, NOT for oracle hash comparison (the driver's
exact RNG is unknown). Deterministic: seed fixed per (table, sf).

Usage: python3 tools/gen_scale.py <sf> <outdir>   # e.g. 1 /tmp/graft_sf1
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = np.array(
    "a agg batch big column customer data dup fast filter group hash join "
    "key line merge order part query row scan slow small sort spark stream "
    "table the value vector window".split())
LANGS = np.array(["en", "de", "zh", "fr", "es"])
LANG_P = np.array([0.41, 0.1475, 0.1475, 0.1475, 0.1475])
T0 = np.datetime64("2024-01-01T00:00:00")


def write(outdir, name, table):
    pq.write_table(table, f"{outdir}/{name}.parquet")
    print(f"[gen_scale] {name}: {table.num_rows} rows")


def gen(sf: float, outdir: str) -> None:
    rng = np.random.default_rng(42)
    n_li = int(6_000_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_cust = int(150_000 * sf)
    n_part = int(200_000 * sf)
    n_supp = int(10_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_docs = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    # region / nation: fixed small dims, same shape as the driver's
    write(outdir, "region", pa.table({
        "r_regionkey": np.arange(5), "r_name": [f"REGION_{i}" for i in range(5)]}))
    write(outdir, "nation", pa.table({
        "n_nationkey": np.arange(25), "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": np.arange(25) % 5}))

    write(outdir, "customer", pa.table({
        "c_custkey": np.arange(n_cust),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": rng.choice(
            ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"],
            n_cust)}))

    adjectives = ["large", "hot", "small", "cold", "fast", "slow", "round",
                  "flat", "long", "short"]
    nouns = ["ring", "bolt", "gear", "cog", "pipe", "rod", "cap", "disk"]
    write(outdir, "part", pa.table({
        "p_partkey": np.arange(n_part),
        "p_name": [f"{adjectives[i % 10]} {nouns[(i // 10) % 8]}"
                   for i in range(n_part)],
        "p_brand": [f"Brand#{i % 25}" for i in rng.integers(0, 25, n_part)],
        "p_type": rng.choice(["LARGE", "ECONOMY", "STANDARD", "SMALL",
                              "MEDIUM", "PROMO"], n_part),
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(900 + np.arange(n_part) * 0.1 % 1000, 2)}))

    write(outdir, "supplier", pa.table({
        "s_suppkey": np.arange(n_supp),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2)}))

    odate = (np.datetime64("1995-01-01") +
             rng.integers(0, 2500, n_ord).astype("timedelta64[D]"))
    write(outdir, "orders", pa.table({
        "o_orderkey": np.arange(n_ord),
        "o_custkey": rng.integers(0, max(n_cust, 1), n_ord),
        "o_orderstatus": rng.choice(["O", "F", "P"], n_ord, p=[.485, .485, .03]),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": odate.astype("datetime64[us]"),
        "o_orderpriority": rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
            n_ord)}))

    # ~4 lines per order, 1..17 — draw order keys with replacement, then
    # linenumber = running index within each order
    lkey = np.sort(rng.integers(0, max(n_ord, 1), n_li))
    lnum = np.ones(n_li, dtype=np.int32)
    same = np.zeros(n_li, dtype=bool)
    same[1:] = lkey[1:] == lkey[:-1]
    run = np.ones(n_li, dtype=np.int32)
    # cumulative run length via segmented cumsum
    idx = np.arange(n_li)
    start = np.where(~same, idx, 0)
    np.maximum.accumulate(start, out=start)
    lnum = (idx - start + 1).astype(np.int32)
    sdate = (np.datetime64("1995-01-01") +
             rng.integers(0, 2500, n_li).astype("timedelta64[D]"))
    qty = rng.integers(1, 51, n_li).astype(float)
    write(outdir, "lineitem", pa.table({
        "l_orderkey": lkey,
        "l_partkey": rng.integers(0, max(n_part, 1), n_li),
        "l_suppkey": rng.integers(0, max(n_supp, 1), n_li),
        "l_linenumber": lnum,
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * rng.uniform(900, 1900, n_li), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2),
        "l_tax": np.round(rng.uniform(0, 0.08, n_li), 2),
        "l_returnflag": rng.choice(["R", "A", "N"], n_li, p=[.25, .25, .5]),
        "l_linestatus": rng.choice(["O", "F"], n_li),
        "l_shipdate": sdate.astype("datetime64[us]")}))

    ts = np.sort(rng.uniform(0, 30 * 86400, n_ev))
    # the driver's events.ts is physically INT64 TIMESTAMP(NANOS) — the
    # graft.engine.Tables nanosAsLong read path depends on it, so the
    # generated decade must match
    write(outdir, "events", pa.table({
        "event_id": np.arange(n_ev),
        "ts": pa.array((T0 + (ts * 1e9).astype("timedelta64[ns]")),
                       type=pa.timestamp("ns")),
        "user_id": rng.integers(0, max(n_users, 1), n_ev),
        "event_type": rng.choice(
            ["signup", "click", "error", "view", "purchase"], n_ev),
        "value": np.round(np.minimum(rng.exponential(50, n_ev), 560), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]}))

    lens = rng.integers(10, 101, n_docs)
    texts = [" ".join(rng.choice(VOCAB, ln)) for ln in lens]
    # planted duplication mirroring the driver corpus's signal density
    # (~5% verified near-dup pairs per 1k docs at sf0.1):
    # ~0.2% exact duplicates (the x30 signal) ...
    for i in rng.choice(np.arange(1, max(n_docs, 2)),
                        max(int(n_docs * 0.002), 1), replace=False):
        texts[i] = texts[rng.integers(0, i)]
    # ... and ~0.5% near-duplicates: copy an earlier doc and flip ONE
    # word — a k=3 shingle set of a 50-word doc changes by ~3 of ~48
    # shingles, Jaccard ≈ 0.88 > the 0.8 verify threshold (x31/x44)
    for i in rng.choice(np.arange(1, max(n_docs, 2)),
                        max(int(n_docs * 0.005), 1), replace=False):
        words = texts[rng.integers(0, i)].split(" ")
        words[rng.integers(0, len(words))] = str(rng.choice(VOCAB))
        texts[i] = " ".join(words)
    write(outdir, "documents", pa.table({
        "doc_id": np.arange(n_docs),
        "text": texts,
        "lang": rng.choice(LANGS, n_docs, p=LANG_P),
        "source": [f"src{i}" for i in rng.integers(0, 20, n_docs)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64)}))

    labels = rng.integers(0, 10, n_emb).astype(np.int32)
    centers = rng.normal(0, 1, (10, 64))
    vecs = (centers[labels] + rng.normal(0, 0.3, (n_emb, 64))).astype(np.float32)
    write(outdir, "embeddings", pa.table({
        "vec_id": np.arange(n_emb),
        "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
        "label": labels}))


if __name__ == "__main__":
    sf = float(sys.argv[1])
    outdir = sys.argv[2]
    import os
    os.makedirs(outdir, exist_ok=True)
    gen(sf, outdir)
