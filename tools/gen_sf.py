"""Deterministic sf-scaled testdata generator for BENCH-ONLY scaling
runs (VERDICT r6 #4: a full-registry sf1 snapshot).

The driver's testdata tops out at sf0.1 and /root/testdata is
read-only, so larger scale factors are generated here: same schemas
(column names + arrow types matched to the driver parquet exactly),
same row-count ratios (rows = ratio × sf), and value distributions
matched to measurements of the sf0.1 tables (documented inline).  This
is NOT the driver's generator — correctness stays pinned at sf0.01
against the driver data; these tables exist only so bench.py can
measure how query time scales with input size.

    python tools/gen_sf.py --sf 1 --out /tmp/sfgen/sf1

Seeded numpy throughout — same sf → byte-identical tables.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# rows per unit sf, measured from /root/testdata/sf0.1 (×10 its counts)
_RATIOS = {
    "customer": 150_000,
    "supplier": 10_000,
    "part": 200_000,
    "orders": 1_500_000,
    "lineitem": 6_000_000,
    "events": 1_000_000,
    "documents": 50_000,
    "embeddings": 20_000,
}
# measured sf0.1 vocab (31 words, 10-100 words/doc, 5 langs w/ en-heavy
# mix, 20 uniform sources, ~0.3% planted exact-dup rate)
_VOCAB = (
    "batch part spark line column order small sort fast value scan a hash "
    "slow group agg filter query big key window row table stream merge "
    "data join scale plan read write"
).split()
_LANGS = ["en", "de", "zh", "fr", "es"]
_LANG_P = [0.41, 0.14, 0.15, 0.15, 0.15]
_TYPES = ["click", "view", "purchase", "signup", "error"]
_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
_PTYPES = ["ECONOMY", "STANDARD", "LARGE", "MEDIUM", "SMALL", "PROMO"]
_PNAME1 = ["small", "hot", "red", "blue", "large", "old", "cold", "new"]
_STATUS = ["F", "O", "P"]
_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"{name}: {table.num_rows} rows", flush=True)


def _money(rng: np.random.Generator, n: int, lo: float, hi: float) -> np.ndarray:
    return np.round(rng.uniform(lo, hi, n), 2)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    sf, out = args.sf, args.out
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)

    n = {t: max(1, int(r * sf)) for t, r in _RATIOS.items()}

    # region/nation: fixed dimensions, identical shape to the driver's
    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    nc = n["customer"]
    _write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(nc), pa.int64()),
        "c_name": [f"Customer#{i}" for i in range(nc)],
        "c_nationkey": pa.array(rng.integers(0, 25, nc), pa.int32()),
        "c_acctbal": _money(rng, nc, -999.99, 9999.99),
        "c_mktsegment": np.array(_SEGMENTS)[rng.integers(0, 5, nc)],
    }))

    ns = n["supplier"]
    _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(ns), pa.int64()),
        "s_name": [f"Supplier#{i}" for i in range(ns)],
        "s_nationkey": pa.array(rng.integers(0, 25, ns), pa.int32()),
        "s_acctbal": _money(rng, ns, -999.99, 9999.99),
    }))

    np_ = n["part"]
    w1 = np.array(_PNAME1)[rng.integers(0, len(_PNAME1), np_)]
    w2 = np.array(_VOCAB)[rng.integers(0, len(_VOCAB), np_)]
    _write(out, "part", pa.table({
        "p_partkey": pa.array(np.arange(np_), pa.int64()),
        "p_name": [f"{a} {b}" for a, b in zip(w1, w2)],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, np_)],
        "p_type": np.array(_PTYPES)[rng.integers(0, len(_PTYPES), np_)],
        "p_size": pa.array(rng.integers(1, 51, np_), pa.int32()),
        "p_retailprice": _money(rng, np_, 900.0, 2000.0),
    }))

    no = n["orders"]
    base = np.datetime64("1995-01-01", "us")
    span_days = (np.datetime64("2001-08-02") - np.datetime64("1995-01-01")).astype(int)
    _write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(no), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, nc, no), pa.int64()),
        "o_orderstatus": np.array(_STATUS)[rng.integers(0, 3, no)],
        "o_totalprice": _money(rng, no, 1000.0, 400000.0),
        "o_orderdate": pa.array(
            base + rng.integers(0, span_days, no).astype("timedelta64[D]").astype(
                "timedelta64[us]"
            ),
            pa.timestamp("us"),
        ),
        "o_orderpriority": np.array(_PRIOS)[rng.integers(0, 5, no)],
    }))

    nl = n["lineitem"]
    # ~4 lines/order (matches 600k/150k), quantity 1-50 integral
    l_order = rng.integers(0, no, nl)
    l_order.sort()
    qty = rng.integers(1, 51, nl).astype(float)
    price = _money(rng, nl, 900.0, 2000.0)
    _write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(l_order, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, np_, nl), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, ns, nl), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, nl), pa.int32()),
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * price, 2),
        "l_discount": np.round(rng.uniform(0.0, 0.1, nl), 2),
        "l_tax": np.round(rng.uniform(0.0, 0.08, nl), 2),
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, nl)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, nl)],
        "l_shipdate": pa.array(
            base + rng.integers(1, span_days + 90, nl).astype(
                "timedelta64[D]"
            ).astype("timedelta64[us]"),
            pa.timestamp("us"),
        ),
    }))

    ne = n["events"]
    n_users = nc // 10  # sf0.1: 1500 users per 15000 customers
    ev_base = np.datetime64("2024-01-01", "us")
    month_us = 30 * 24 * 3600 * 1_000_000
    _write(out, "events", pa.table({
        "event_id": pa.array(np.arange(ne), pa.int64()),
        "ts": pa.array(
            ev_base + np.sort(rng.integers(0, month_us, ne)).astype(
                "timedelta64[us]"
            ),
            pa.timestamp("us"),
        ),
        "user_id": pa.array(rng.integers(0, n_users, ne), pa.int64()),
        "event_type": np.array(_TYPES)[rng.integers(0, 5, ne)],
        "value": np.round(rng.uniform(0.0, 100.0, ne), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, ne)],
    }))

    nd = n["documents"]
    lengths = rng.integers(10, 101, nd)
    vocab = np.array(_VOCAB)
    texts = [
        " ".join(vocab[rng.integers(0, len(vocab), ln)]) for ln in lengths
    ]
    # planted exact dups, sf0.1-measured rate (8 pairs / 5000 docs)
    n_dup = max(1, nd // 625)
    dup_to = rng.integers(0, nd, n_dup)
    dup_from = rng.integers(0, nd, n_dup)
    for a, b in zip(dup_to, dup_from):
        if a != b:
            texts[int(a)] = texts[int(b)]
    _write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(nd), pa.int64()),
        "text": texts,
        "lang": np.array(_LANGS)[
            rng.choice(len(_LANGS), nd, p=np.array(_LANG_P))
        ],
        "source": [f"src{i % 20}" for i in rng.integers(0, 20, nd)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    nv = n["embeddings"]
    labels = rng.integers(0, 10, nv)
    # r8 fix: the r7 generator planted 10 strongly-separated centroids
    # (within-label cos ≈ 0.88), but the DRIVER's embeddings measure as
    # pure isotropic UNIT vectors with decorative labels (norm exactly
    # 1.0, within-label and cross-label cos both N(0, 1/64), pairs
    # ≥ 0.45 a ~7e-5 tail) — the clustered version made 10% of all sf1
    # pairs "near-dups" (20 M pairs), so the r7 sf1 similarity-family
    # factors measured output explosion on the wrong data regime, not
    # scaling (SCALE.md r8 notes).  Match the measurement instead.
    vecs = rng.normal(0.0, 1.0, (nv, 64))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(np.float32)
    _write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(nv), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
