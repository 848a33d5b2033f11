"""Generate a TIMING-PROXY scale-factor directory (default ~sf1.0).

The driver escalated its round-end measurement to sf1.0 (BENCH_r05.json
``"sf": 1.0``) but only sf0.001/0.01/0.1 live under /root/testdata and
the driver's generator is not in-repo.  This script synthesizes tables
with the SAME schema and matched marginal distributions (row counts,
vocab, doc-length, dup/near-dup rates, key cardinalities, value ranges)
so optimization work can be timed at the driver's scale.

It is a PROXY for performance measurement ONLY: the rows are not the
driver's rows, so it must never back a correctness claim — the DuckDB
oracle at the provided sf0.001/0.01/0.1 dirs stays the decider — and
nothing in the engine reads or caches anything from the proxy dir.

Usage: python tools/gen_proxy_sf.py [out_dir] [sf]
       (default: /tmp/sfproxy1.0 1.0)
"""
from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_W = [0.41, 0.15, 0.15, 0.15, 0.14]
SEGMENTS = ["MACHINERY", "BUILDING", "FURNITURE", "AUTOMOBILE", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
P_ADJ = ["large", "hot", "blue", "old", "cold", "new", "red", "small"]
P_NOUN = ["ring", "bolt", "plate", "screw", "gear", "cap"]
P_TYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM", "PROMO"]
EVENT_TYPES = ["click", "view", "signup", "purchase", "error"]

DAY_US = 86_400_000_000


def write(out_dir: str, name: str, cols: dict) -> None:
    pq.write_table(pa.table(cols), f"{out_dir}/{name}.parquet")
    print(f"{name}: {len(next(iter(cols.values())))} rows")


def gen_documents(rng: np.random.Generator, n: int) -> dict:
    texts: list[str] = []
    for i in range(n):
        if i % 20 == 11 and texts:
            # near-dup: copy an earlier doc, inject the 'dup' token at a
            # random position (matches the ~5% 'dup'-bearing rate and the
            # near-copy Jaccard shape of the driver data)
            src = texts[int(rng.integers(0, len(texts)))].split(" ")
            src.insert(int(rng.integers(0, len(src) + 1)), "dup")
            texts.append(" ".join(src))
        elif i % 625 == 624 and texts:
            texts.append(texts[int(rng.integers(0, len(texts)))])  # exact dup
        else:
            k = int(rng.integers(10, 101))
            texts.append(" ".join(
                VOCAB[j] for j in rng.integers(0, len(VOCAB), size=k)))
    lang = rng.choice(LANGS, size=n, p=LANG_W)
    return {
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "lang": lang,
        "source": [f"src{i % 20}" for i in range(n)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int32),
    }


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfproxy1.0"
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    import os
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)

    write(out_dir, "region", {
        "r_regionkey": np.arange(5, dtype=np.int32), "r_name": REGIONS})
    write(out_dir, "nation", {
        "n_nationkey": np.arange(25, dtype=np.int32),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": np.arange(25, dtype=np.int32) % 5})

    n_cust = int(150_000 * sf)
    write(out_dir, "customer", {
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": rng.choice(SEGMENTS, n_cust)})

    n_supp = int(10_000 * sf)
    write(out_dir, "supplier", {
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2)})

    n_part = int(200_000 * sf)
    write(out_dir, "part", {
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": [f"{P_ADJ[int(a)]} {P_NOUN[int(b)]}" for a, b in zip(
            rng.integers(0, len(P_ADJ), n_part),
            rng.integers(0, len(P_NOUN), n_part))],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": rng.choice(P_TYPES, n_part),
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(900.0 + np.arange(n_part) * 0.1, 2)})

    n_ord = int(1_500_000 * sf)
    t0 = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
    t1 = np.datetime64("2001-08-01").astype("datetime64[us]").astype(np.int64)
    odate = rng.integers(t0, t1, n_ord)
    odate -= odate % DAY_US
    write(out_dir, "orders", {
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": rng.choice(["O", "P", "F"], n_ord),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": odate.astype("datetime64[us]"),
        "o_orderpriority": rng.choice(PRIORITIES, n_ord)})

    n_li = int(6_000_000 * sf)
    lok = rng.integers(0, n_ord, n_li)
    sdate = odate[lok] + rng.integers(1, 95, n_li) * DAY_US
    write(out_dir, "lineitem", {
        "l_orderkey": lok,
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": rng.integers(1, 8, n_li).astype(np.int32),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": rng.choice(["R", "N", "A"], n_li),
        "l_linestatus": rng.choice(["O", "F"], n_li),
        "l_shipdate": sdate.astype("datetime64[us]")})

    n_ev = int(1_000_000 * sf)
    e0 = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
    e1 = np.datetime64("2024-01-31").astype("datetime64[us]").astype(np.int64)
    write(out_dir, "events", {
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": rng.integers(e0, e1, n_ev).astype("datetime64[us]"),
        "user_id": rng.integers(0, int(15_000 * sf), n_ev),
        "event_type": rng.choice(EVENT_TYPES, n_ev),
        "value": np.round(rng.uniform(0, 560, n_ev), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]})

    n_doc = int(50_000 * sf)
    write(out_dir, "documents", gen_documents(rng, n_doc))

    n_emb = int(20_000 * sf)
    vecs = rng.normal(size=(n_emb, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    write(out_dir, "embeddings", {
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
        "label": rng.integers(0, 10, n_emb).astype(np.int32)})


if __name__ == "__main__":
    main()
