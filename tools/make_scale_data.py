#!/usr/bin/env python3
"""Generate statistically-matched synthetic events/documents tables at an
arbitrary scale factor, for the measured scale-up decade (SCALE.md).

The driver's testdata tops out at sf0.1 and /root/testdata is read-only,
so scaling measurements beyond that need locally-generated inputs.  This
reproduces the driver tables' measured distributions (profiled from
sf0.01/sf0.1 with DuckDB):

  events:    10^6*sf rows; user_id uniform over 15000*sf users; ts uniform
             over 2024-01-01..31 (written ts-sorted); event_type uniform
             over 5; value ~ Exp(mean 50); props = {"k": 0..99}
  documents: 5*10^4*sf rows; text = bag of words from a 31-token vocab,
             length uniform ~8..110 words (n_chars ~44..577, mean ~298);
             lang 40% en / 15% each zh es fr de; source uniform src0..19;
             ~0.2% exact duplicates (matches the driver's 8/5000 rate)

Same recipe at every sf => scaling exponents measured across the decade
are attributable to the ENGINE, not to generator drift.  Usage:

    python tools/make_scale_data.py 1.0 [outdir]   # default .scaledata/sf1.0
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "key agg row scan slow fast table value part hash a the merge batch "
    "spark line sort window order data column join small customer query "
    "big group stream filter sample index"
).split()
assert len(VOCAB) == 31

LANGS = np.array(["en", "zh", "es", "fr", "de"])
LANG_P = np.array([0.40, 0.15, 0.15, 0.15, 0.15])
EVENT_TYPES = np.array(["view", "click", "signup", "purchase", "error"])


def make_events(sf: float, rng: np.random.Generator) -> pa.Table:
    n = int(1_000_000 * sf)
    n_users = max(int(15_000 * sf), 10)
    t0 = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
    t1 = np.datetime64("2024-01-31T00:00:00", "us").astype("int64")
    ts = np.sort(rng.integers(t0, t1, size=n))
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype="int64")),
            "ts": pa.array(ts.astype("datetime64[us]")),
            "user_id": pa.array(rng.integers(0, n_users, size=n)),
            "event_type": pa.array(rng.choice(EVENT_TYPES, size=n)),
            "value": pa.array(np.round(rng.exponential(50.0, size=n), 2)),
            "props": pa.array(
                [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, size=n)]
            ),
        }
    )


def make_documents(sf: float, rng: np.random.Generator) -> pa.Table:
    n = int(50_000 * sf)
    lens = rng.integers(8, 111, size=n)
    texts = [
        " ".join(rng.choice(VOCAB, size=ln)) for ln in lens
    ]
    # exact-duplicate rate ~0.2%: copy a random earlier doc's text
    n_dups = max(int(round(n * 0.002)), 0)
    if n_dups and n > 1:
        for i in rng.choice(np.arange(1, n), size=n_dups, replace=False):
            texts[int(i)] = texts[int(rng.integers(0, i))]
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype="int64")),
            "text": pa.array(texts),
            "lang": pa.array(rng.choice(LANGS, size=n, p=LANG_P)),
            "source": pa.array(
                [f"src{s}" for s in rng.integers(0, 20, size=n)]
            ),
            "n_chars": pa.array(
                np.array([len(t) for t in texts], dtype="int64")
            ),
        }
    )


# ---------------------------------------------------------------------------
# TPC-H-ish relational tables + embeddings, matched to the driver
# testdata's measured schemas/distributions (profiled from sf0.1 with
# DuckDB), so the FULL registry -- not just the events/documents ops --
# can be correctness-swept at sf1.0 (r8 verdict item #6).  Correctness
# there is Spark-vs-DuckDB over the SAME files, so what matters is the
# schema and realistic cardinalities/value ranges, not byte-level
# equality with the driver's generator.
# ---------------------------------------------------------------------------

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
ORDER_PRIORITIES = [
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
P_ADJS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
P_NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]


def _days(lo: str, hi: str, size: int, rng) -> np.ndarray:
    a = np.datetime64(lo).astype("int64")
    b = np.datetime64(hi).astype("int64")
    return (
        rng.integers(a, b + 1, size=size).astype("datetime64[D]")
    ).astype("datetime64[us]")


def make_tpch(sf: float, rng: np.random.Generator) -> dict[str, pa.Table]:
    n_cust = max(int(150_000 * sf), 10)
    n_supp = max(int(10_000 * sf), 5)
    n_part = max(int(200_000 * sf), 10)
    n_ord = max(int(1_500_000 * sf), 20)
    out: dict[str, pa.Table] = {}
    out["region"] = pa.table(
        {
            "r_regionkey": pa.array(np.arange(5, dtype="int32")),
            "r_name": pa.array(REGIONS),
        }
    )
    out["nation"] = pa.table(
        {
            "n_nationkey": pa.array(np.arange(25, dtype="int32")),
            "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
            "n_regionkey": pa.array((np.arange(25) % 5).astype("int32")),
        }
    )
    out["customer"] = pa.table(
        {
            "c_custkey": pa.array(np.arange(n_cust, dtype="int64")),
            "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
            "c_nationkey": pa.array(
                rng.integers(0, 25, size=n_cust).astype("int32")
            ),
            "c_acctbal": pa.array(
                np.round(rng.uniform(-1000, 10000, size=n_cust), 2)
            ),
            "c_mktsegment": pa.array(rng.choice(SEGMENTS, size=n_cust)),
        }
    )
    out["supplier"] = pa.table(
        {
            "s_suppkey": pa.array(np.arange(n_supp, dtype="int64")),
            "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
            "s_nationkey": pa.array(
                rng.integers(0, 25, size=n_supp).astype("int32")
            ),
            "s_acctbal": pa.array(
                np.round(rng.uniform(-1000, 10000, size=n_supp), 2)
            ),
        }
    )
    adjs = rng.choice(P_ADJS, size=n_part)
    nouns = rng.choice(P_NOUNS, size=n_part)
    out["part"] = pa.table(
        {
            "p_partkey": pa.array(np.arange(n_part, dtype="int64")),
            "p_name": pa.array([f"{a} {n}" for a, n in zip(adjs, nouns)]),
            "p_brand": pa.array(
                [f"Brand#{b}" for b in rng.integers(1, 26, size=n_part)]
            ),
            "p_type": pa.array(rng.choice(P_TYPES, size=n_part)),
            "p_size": pa.array(
                rng.integers(1, 51, size=n_part).astype("int32")
            ),
            "p_retailprice": pa.array(
                np.round(900.0 + (np.arange(n_part) % 1000) / 10.0, 1)
            ),
        }
    )
    out["orders"] = pa.table(
        {
            "o_orderkey": pa.array(np.arange(n_ord, dtype="int64")),
            "o_custkey": pa.array(rng.integers(0, n_cust, size=n_ord)),
            "o_orderstatus": pa.array(
                rng.choice(np.array(["O", "P", "F"]), size=n_ord)
            ),
            "o_totalprice": pa.array(
                np.round(rng.uniform(1000, 500_000, size=n_ord), 2)
            ),
            "o_orderdate": pa.array(
                _days("1995-01-01", "2001-08-01", n_ord, rng)
            ),
            "o_orderpriority": pa.array(
                rng.choice(ORDER_PRIORITIES, size=n_ord)
            ),
        }
    )
    # ~Poisson(4) lines per order (driver-measured: P(0)=1.8%, mean 4)
    n_lines = rng.poisson(4.0, size=n_ord).clip(max=17)
    l_orderkey = np.repeat(np.arange(n_ord, dtype="int64"), n_lines)
    n_li = int(l_orderkey.shape[0])
    linenumber = (
        np.arange(n_li, dtype="int64")
        - np.repeat(np.cumsum(n_lines) - n_lines, n_lines)
        + 1
    ).astype("int32")
    out["lineitem"] = pa.table(
        {
            "l_orderkey": pa.array(l_orderkey),
            "l_partkey": pa.array(rng.integers(0, n_part, size=n_li)),
            "l_suppkey": pa.array(rng.integers(0, n_supp, size=n_li)),
            "l_linenumber": pa.array(linenumber),
            "l_quantity": pa.array(
                rng.integers(1, 51, size=n_li).astype("float64")
            ),
            "l_extendedprice": pa.array(
                np.round(rng.uniform(900, 105_000, size=n_li), 2)
            ),
            "l_discount": pa.array(
                np.round(rng.integers(0, 11, size=n_li) / 100.0, 2)
            ),
            "l_tax": pa.array(
                np.round(rng.integers(0, 9, size=n_li) / 100.0, 2)
            ),
            "l_returnflag": pa.array(
                rng.choice(np.array(["A", "N", "R"]), size=n_li)
            ),
            "l_linestatus": pa.array(
                rng.choice(np.array(["O", "F"]), size=n_li)
            ),
            "l_shipdate": pa.array(
                _days("1995-01-02", "2001-11-04", n_li, rng)
            ),
        }
    )
    n_emb = max(int(20_000 * sf), 10)
    vecs = rng.standard_normal((n_emb, 64)).astype("float32")
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    out["embeddings"] = pa.table(
        {
            "vec_id": pa.array(np.arange(n_emb, dtype="int64")),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
            "label": pa.array(
                rng.integers(0, 10, size=n_emb).astype("int32")
            ),
        }
    )
    return out


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--all-tables"]
    all_tables = "--all-tables" in sys.argv[1:]
    sf = float(argv[0]) if argv else 1.0
    out = (
        argv[1]
        if len(argv) > 1
        else os.path.join(os.path.dirname(__file__), "..", ".scaledata", f"sf{sf}")
    )
    out = os.path.abspath(out)
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    ev = make_events(sf, rng)
    pq.write_table(ev, os.path.join(out, "events.parquet"))
    docs = make_documents(sf, rng)
    pq.write_table(docs, os.path.join(out, "documents.parquet"))
    extra = ""
    if all_tables:
        tables = make_tpch(sf, rng)
        for name, tbl in tables.items():
            pq.write_table(tbl, os.path.join(out, f"{name}.parquet"))
        extra = " " + " ".join(
            f"{n}={t.num_rows}" for n, t in tables.items()
        )
    print(
        f"wrote {out}: events={ev.num_rows} documents={docs.num_rows}{extra}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
