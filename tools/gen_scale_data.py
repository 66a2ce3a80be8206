#!/usr/bin/env python
"""Deterministic synthetic-data generator for SCALE measurements.

The driver ships sf0.001/0.01/0.1 only (TESTDATA.md) and /root/testdata
is read-only, so the sf1.0 empirical scale point (round-14 verdict #2)
needs self-generated data. This generator mirrors the driver tables'
schemas and marginal distributions (profiled from sf0.1: key ranges,
category sets, date spans, the 31-word document vocabulary, unit-norm
64-d embeddings, the ~0.16% exact-dup plant, the exponential(50)
events value) so per-query cost *shape* matches — and the scale slope
is always measured between TWO self-generated dirs (e.g. gen-0.1 vs
gen-1.0), never generated-vs-driver, so any residual distribution
mismatch cancels out of the ratio.

Cross-table coherence that the queries exploit is preserved:
``l_shipdate = o_orderdate(l_orderkey) + U{1..95} days`` via a
splitmix64 hash of the orderkey (the same function both tables use),
``l_orderkey`` uniform over the order key space (leaving ~e^-4 of
orders lineitem-less, as in the driver data), events ``user_id`` over
a 15k*sf user space.

Usage: python tools/gen_scale_data.py SF OUTDIR [SEED]

Writes one parquet FILE per table (same layout as /root/testdata) with
128k-row row groups so Spark's ranged splits parallelize the scan of a
single file. events.ts is written as TIMESTAMP(NANOS) to exercise the
same nanosAsLong read path the driver data takes.
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEGS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
ETYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.4, 0.15, 0.15, 0.15, 0.15]
VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data", "dup",
         "fast", "filter", "group", "hash", "join", "key", "line", "merge",
         "order", "part", "query", "row", "scan", "slow", "small", "sort",
         "spark", "stream", "table", "the", "value", "vector", "window"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]

DAY_US = 86_400_000_000
EPOCH_1995 = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
ORDER_SPAN_DAYS = 2404  # 1995-01-01 .. 2001-08-01


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — the shared key->value hash that gives
    orders and lineitem the SAME o_orderdate without a generator-side
    join."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def orderdate_us(okey: np.ndarray, seed: int) -> np.ndarray:
    h = splitmix64(okey.astype(np.uint64) ^ np.uint64(seed * 7919 + 11))
    days = (h % np.uint64(ORDER_SPAN_DAYS)).astype(np.int64)
    return EPOCH_1995 + days * DAY_US


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out_dir, f"{name}.parquet")
    pq.write_table(table, path, row_group_size=131_072)
    print(f"  {name}: {table.num_rows} rows -> {path}")


def gen(sf: float, out_dir: str, seed: int = 42) -> None:
    os.makedirs(out_dir, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_user = int(15_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": pa.array(REGIONS)}))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": pa.array([f"NATION_{i:02d}" for i in range(25)]),
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())}))

    r = np.random.default_rng(seed + 1)
    k = np.arange(n_cust, dtype=np.int64)
    _write(out_dir, "customer", pa.table({
        "c_custkey": k,
        "c_name": pa.array([f"Customer#{i:09d}" for i in k]),
        "c_nationkey": r.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(r.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGS)[r.integers(0, 5, n_cust)])}))

    r = np.random.default_rng(seed + 2)
    k = np.arange(n_supp, dtype=np.int64)
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": k,
        "s_name": pa.array([f"Supplier#{i:09d}" for i in k]),
        "s_nationkey": r.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(r.uniform(-1000, 10000, n_supp), 2)}))

    r = np.random.default_rng(seed + 3)
    k = np.arange(n_part, dtype=np.int64)
    adj = np.array(ADJS)[r.integers(0, 8, n_part)]
    noun = np.array(NOUNS)[r.integers(0, 8, n_part)]
    _write(out_dir, "part", pa.table({
        "p_partkey": k,
        "p_name": pa.array([f"{a} {b}" for a, b in zip(adj, noun)]),
        "p_brand": pa.array([f"Brand#{i}" for i in
                             r.integers(1, 26, n_part)]),
        "p_type": pa.array(np.array(PTYPES)[r.integers(0, 6, n_part)]),
        "p_size": r.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(r.uniform(900, 1000, n_part), 2)}))

    r = np.random.default_rng(seed + 4)
    okey = np.arange(n_ord, dtype=np.int64)
    _write(out_dir, "orders", pa.table({
        "o_orderkey": okey,
        "o_custkey": r.integers(0, n_cust, n_ord),
        "o_orderstatus": pa.array(np.array(["F", "O", "P"])[
            r.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(r.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": orderdate_us(okey, seed).view("datetime64[us]"),
        "o_orderpriority": pa.array(np.array(PRIO)[r.integers(0, 5, n_ord)])}))

    r = np.random.default_rng(seed + 5)
    lok = r.integers(0, n_ord, n_li)
    ship = (orderdate_us(lok, seed)
            + r.integers(1, 96, n_li) * DAY_US)
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": lok,
        "l_partkey": r.integers(0, n_part, n_li),
        "l_suppkey": r.integers(0, n_supp, n_li),
        "l_linenumber": r.integers(1, 8, n_li).astype(np.int32),
        "l_quantity": r.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(r.uniform(900, 105_000, n_li), 2),
        "l_discount": r.integers(0, 11, n_li) / 100.0,
        "l_tax": r.integers(0, 9, n_li) / 100.0,
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[
            r.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[
            r.integers(0, 2, n_li)]),
        "l_shipdate": ship.view("datetime64[us]")}))

    r = np.random.default_rng(seed + 6)
    ev0 = np.datetime64("2024-01-01").astype("datetime64[ns]").astype(np.int64)
    ts = ev0 + r.integers(0, 30 * 86_400 * 10**9, n_ev, dtype=np.int64)
    ts = np.sort(ts)  # event logs arrive roughly time-ordered
    _write(out_dir, "events", pa.table({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": ts.view("datetime64[ns]"),
        "user_id": r.integers(0, n_user, n_ev),
        "event_type": pa.array(np.array(ETYPES)[r.integers(0, 5, n_ev)]),
        "value": np.round(r.exponential(50.0, n_ev), 2),
        "props": pa.array([f'{{"k": {v}}}' for v in
                           r.integers(0, 100, n_ev)])}))

    r = np.random.default_rng(seed + 7)
    nw = r.integers(10, 101, n_doc)
    flat = np.array(VOCAB)[r.integers(0, len(VOCAB), int(nw.sum()))]
    offs = np.concatenate([[0], np.cumsum(nw)])
    texts = [" ".join(flat[offs[i]:offs[i + 1]]) for i in range(n_doc)]
    dup_at = np.nonzero((r.random(n_doc) < 0.0016) &
                        (np.arange(n_doc) > 0))[0]
    for i in dup_at:  # plant exact dups at the driver data's ~0.16% rate
        texts[i] = texts[i - 1]
    _write(out_dir, "documents", pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": pa.array(texts),
        "lang": pa.array(np.array(LANGS)[
            r.choice(5, n_doc, p=LANG_P)]),
        "source": pa.array([f"src{i}" for i in r.integers(0, 20, n_doc)]),
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64)}))

    r = np.random.default_rng(seed + 8)
    centers = r.normal(size=(10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    label = r.integers(0, 10, n_emb).astype(np.int32)
    vec = r.normal(size=(n_emb, 64)) + 0.35 * centers[label]
    vec /= np.linalg.norm(vec, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(list(vec.astype(np.float32))),
        "label": label}))


if __name__ == "__main__":
    sf = float(sys.argv[1])
    out = sys.argv[2]
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    print(f"generating sf={sf} seed={seed} -> {out}")
    gen(sf, out, seed)
