"""Scale-up generator: build sfN data by tiling the driver's sf0.1 tables.

The driver only ships sf0.001/0.01/0.1; at sf0.1 every bench query is
dominated by fixed overhead (~0.5 s JVM/session cost per query), so plan
quality is invisible. This tool manufactures a larger scale factor by
replicating the sf0.1 tables K times with key offsets — every copy
shifts the primary and foreign keys by ``copy * stride`` in lockstep, so
referential integrity, join fan-outs, selectivity, and value
distributions are preserved exactly while cardinality grows K-fold.
``region``/``nation`` are fixed dimensions and are copied verbatim.
``events`` additionally shifts ``user_id`` by the custkey stride so each
copy's users are distinct users that join their own copy's customers;
note event ``ts`` values are still duplicated verbatim across copies
(per-user timelines replicate under *different* user ids — fine for
sessionize/window shapes, but the global timestamp histogram is K
spikes, not a longer timeline).

``documents`` and ``embeddings`` get content decorrelation on top of the
key shift — verbatim tiling would multiply every near-duplicate cluster
by K, inflating the near-dup *pair* count by K² (measured: 30-40×
blow-ups in the dedup/cosine bench queries), which no real corpus does:

* each document copy applies a copy-specific bijective token remap
  (rotate each word's characters by the copy number) — within-copy
  shingle sets are isomorphic, so the engineered near-dup rate per copy
  is exactly the original, while cross-copy shingle overlap collapses;
* each embedding copy is multiplied by a copy-specific random orthogonal
  matrix — within-copy cosines (and unit norms) are preserved exactly,
  cross-copy cosines become those of unrelated random vectors.

Output goes inside the repo (default ``.localdata/sf1``, gitignored) —
the driver's /root/testdata is read-only and must not be touched.

Usage: python tools/gen_sf.py [--copies 10] [--src /root/testdata/sf0.1]
                              [--out .localdata/sf1]
"""

from __future__ import annotations

import argparse
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: key columns shifted per copy, per table (PKs and the FKs that point at
#: a tiled table — nationkey FKs point at the fixed dims and stay put).
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}
#: columns whose key family is not derivable from the name — events.user_id
#: joins customer.c_custkey, so it must shift by the custkey stride (each
#: copy's users are then distinct users that still join their copy's
#: customers; without this, every user would get K identical-timestamp
#: copies of each event and events↔customer joins would only match copy 0).
FAMILY_OVERRIDE = {"user_id": "custkey"}
FIXED = ["region", "nation"]
#: tables whose *content* must decorrelate across copies (see module doc)
CONTENT = {"documents": "doc_id", "embeddings": "vec_id"}


def _stride(con, src: str, table: str, cols: list[str]) -> int:
    """One shared stride per table copy: > max over all shifted key
    columns, rounded up to a readable power of ten."""
    m = 0
    for c in cols:
        m = max(m, con.sql(
            f"SELECT max({c}) FROM '{src}/{table}.parquet'"
        ).fetchone()[0])
    stride = 1
    while stride <= m:
        stride *= 10
    return stride


def _rot_word(w: str, c: int) -> str:
    """Copy-``c`` bijective token remap: rotate the characters by
    ``c % len`` and Caesar-shift alphabetic characters by ``c % 26``.

    Rotation alone collides between copies whose difference is a
    multiple of the word length (at 100 copies that re-correlates short
    words across e.g. copies 3 and 7); the added Caesar shift makes a
    cross-copy word collision require the copy difference to satisfy
    both congruences (mod 26 *and* mod len), and a whole *shingle*
    collision to satisfy them for every word — vanishingly rare even at
    100+ copies. Both ops preserve word length, so ``n_chars`` and all
    length-based text stats are unchanged."""
    k = c % len(w) if w else 0
    rotated = w[k:] + w[:k] if k else w
    shift = c % 26
    if not shift:
        return rotated
    out = []
    for ch in rotated:
        o = ord(ch)
        if 97 <= o <= 122:
            out.append(chr(97 + (o - 97 + shift) % 26))
        elif 65 <= o <= 90:
            out.append(chr(65 + (o - 65 + shift) % 26))
        else:
            out.append(ch)
    return "".join(out)


def _tile_documents(src: str, out: str, copies: int, stride: int) -> int:
    import pandas as pd
    import pyarrow.parquet as pq

    base = pq.read_table(f"{src}/documents.parquet").to_pandas()
    parts = [base]
    for c in range(1, copies):
        d = base.copy()
        d["doc_id"] = d["doc_id"] + c * stride
        d["text"] = d["text"].map(
            lambda t, c=c: " ".join(_rot_word(w, c) for w in t.split(" "))
        )
        d["n_chars"] = d["text"].str.len().astype("int64")
        parts.append(d)
    full = pd.concat(parts, ignore_index=True)
    full.to_parquet(f"{out}/documents.parquet", index=False,
                    row_group_size=262144)
    return len(full)


def _tile_embeddings(src: str, out: str, copies: int, stride: int) -> int:
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    base = pq.read_table(f"{src}/embeddings.parquet").to_pandas()
    dim = len(base["embedding"].iloc[0])
    mat = np.stack(base["embedding"].to_numpy()).astype(np.float64)
    parts = [base]
    for c in range(1, copies):
        rng = np.random.RandomState(1000 + c)
        # random orthogonal transform: QR of a gaussian, sign-fixed so
        # the rotation is deterministic across numpy versions
        q, r = np.linalg.qr(rng.standard_normal((dim, dim)))
        q *= np.sign(np.diag(r))
        rotated = (mat @ q).astype(np.float32)
        d = base.copy()
        d["vec_id"] = d["vec_id"] + c * stride
        d["embedding"] = list(rotated)
        parts.append(d)
    full = pd.concat(parts, ignore_index=True)
    full.to_parquet(f"{out}/embeddings.parquet", index=False,
                    row_group_size=65536)
    return len(full)


def generate(src: str, out: str, copies: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in FIXED:
        con.sql(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{out}/{t}.parquet'"
            " (FORMAT PARQUET)"
        )
        print(f"{t}: copied verbatim")
    # orders/lineitem must share the orderkey stride, customer/orders the
    # custkey stride, etc. — compute one stride per *key family*.
    fam_stride = {}

    def _family(col: str) -> str:
        return FAMILY_OVERRIDE.get(col, col.split("_", 1)[1])

    for t, cols in KEYED.items():
        for c in cols:
            fam_stride[_family(c)] = max(
                fam_stride.get(_family(c), 0), _stride(con, src, t, [c])
            )
    for t, cols in KEYED.items():
        exprs = []
        desc = con.sql(f"SELECT * FROM '{src}/{t}.parquet' LIMIT 0").description
        for name, *_ in desc:
            if name in cols:
                exprs.append(
                    f"{name} + CAST(c.copy AS BIGINT) * "
                    f"{fam_stride[_family(name)]} AS {name}"
                )
            else:
                exprs.append(name)
        sel = ", ".join(exprs)
        con.sql(
            f"COPY (SELECT {sel} FROM '{src}/{t}.parquet', "
            f"(SELECT unnest(range({copies})) AS copy) c "
            f"ORDER BY {cols[0]}) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows ({copies}x, strides "
              f"{ {c: fam_stride[c.split('_', 1)[1]] for c in cols} })")
    for t, key in CONTENT.items():
        stride = _stride(con, src, t, [key])
        tiler = _tile_documents if t == "documents" else _tile_embeddings
        n = tiler(src, out, copies, stride)
        print(f"{t}: {n} rows ({copies}x decorrelated, stride {stride})")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata", "sf1"))
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()
    generate(args.src, args.out, args.copies)
    return 0


if __name__ == "__main__":
    sys.exit(main())
