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


def main() -> int:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(__file__), "..", ".scaledata", f"sf{sf}")
    )
    out = os.path.abspath(out)
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    ev = make_events(sf, rng)
    pq.write_table(ev, os.path.join(out, "events.parquet"))
    docs = make_documents(sf, rng)
    pq.write_table(docs, os.path.join(out, "documents.parquet"))
    print(
        f"wrote {out}: events={ev.num_rows} documents={docs.num_rows}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
