"""Build a true sf1.0 test-data tier — 10x sf0.1 — for scale-growth runs.

The driver testdata tops out at sf0.1 (600k lineitem), so every growth
exponent measured so far came from the synthetic x1/x3 audit dirs — fine
for catching quadratic plans, weak as evidence of real 10x behavior. This
tool builds an sf1.0 tier (6M lineitem) that loads through the exact same
code paths as the driver dirs:

- TPC-H tables (customer/supplier/part/orders/lineitem): 10 tile-and-shift
  replicas of the sf0.1 parquet. All keys are dense from 0, so replica r
  shifts each key family by r * its sf0.1 cardinality; foreign keys shift
  in lockstep, so join selectivity and per-key group sizes are preserved
  exactly while key-space cardinality grows 10x — the TPC-H scaling law
  (fixed dimension vocabularies, growing key space). Customer/Supplier
  names are re-derived from the shifted key (they are key-formatted
  strings), keeping name-keyed group-bys (q18) 1:1 with the key.
- region/nation: copied (fixed tables at every TPC-H scale).
- documents/events/embeddings: the scale_growth_audit generator at
  mult=10 — same distribution family as the driver tables (31-word
  vocab, 20 sources, ~2% near-dups; 30-day event span; 64-dim clustered
  embeddings), so dedup rates and grid cardinalities scale the way a
  real corpus does instead of the way naive row replication would
  (replication makes EVERY doc an exact dup — useless for dedup timing).

Output: /tmp/scale_tier/sf1.0 (name carries "sf1.0" so bench.py's sf_of()
parses it). ~150 MB parquet; regenerate on demand, nothing committed.

Usage: python tools/build_sf1.py [--out /tmp/scale_tier/sf1.0] [--mult 10]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_growth_audit import (  # noqa: E402
    N_DOCS,
    N_EVENTS,
    N_VECS,
    gen_documents,
    gen_embeddings,
    gen_events,
)

SRC_SF = "/root/testdata/sf0.1"

#: key column -> sf0.1 cardinality (dense from 0), per table.
KEY_STRIDES: dict[str, dict[str, int]] = {
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {
        "l_orderkey": 150_000,
        "l_partkey": 20_000,
        "l_suppkey": 1_000,
    },
}

#: name column -> (prefix, key column) for key-formatted string columns.
KEYED_NAMES: dict[str, tuple[str, str, str]] = {
    "customer": ("c_name", "Customer#", "c_custkey"),
    "supplier": ("s_name", "Supplier#", "s_suppkey"),
}


def tile_table(name: str, mult: int) -> pa.Table:
    src = pq.read_table(os.path.join(SRC_SF, f"{name}.parquet"))
    strides = KEY_STRIDES[name]
    replicas = []
    for r in range(mult):
        t = src
        for col, stride in strides.items():
            i = t.schema.get_field_index(col)
            shifted = pc.add(t.column(col), pa.scalar(r * stride, pa.int64()))
            t = t.set_column(i, t.schema.field(col), shifted.cast(t.schema.field(col).type))
        if name in KEYED_NAMES:
            ncol, prefix, kcol = KEYED_NAMES[name]
            keys = t.column(kcol).to_numpy()
            names = pa.array([f"{prefix}{k:09d}" for k in keys], pa.string())
            t = t.set_column(t.schema.get_field_index(ncol), t.schema.field(ncol), names)
        replicas.append(t)
    return pa.concat_tables(replicas)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/scale_tier/sf1.0")
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument(
        "--tables",
        default="",
        help="comma list to build a PARTIAL tier (e.g. 'documents,embeddings'"
        " for corpus-query decades where in-memory TPC-H tiling would not"
        " fit); default builds every table",
    )
    args = ap.parse_args()
    only = {t for t in args.tables.split(",") if t} or None
    want = lambda t: only is None or t in only  # noqa: E731

    os.makedirs(args.out, exist_ok=True)
    for t in ("region", "nation"):
        if not want(t):
            continue
        shutil.copy(os.path.join(SRC_SF, f"{t}.parquet"), args.out)
        print(f"{t}: copied")

    for name in ("customer", "supplier", "part", "orders", "lineitem"):
        if not want(name):
            continue
        tbl = tile_table(name, args.mult)
        pq.write_table(tbl, os.path.join(args.out, f"{name}.parquet"))
        print(f"{name}: {tbl.num_rows} rows ({args.mult} shifted replicas)")

    rng = np.random.default_rng(args.seed)
    for name, gen, base in (
        ("documents", gen_documents, N_DOCS),
        ("events", gen_events, N_EVENTS),
        ("embeddings", gen_embeddings, N_VECS),
    ):
        if not want(name):
            # NOTE: skipping advances nothing — later tables in a partial
            # build draw from an earlier rng stream position than in a full
            # build. Same distribution family, different draw; fine for
            # cross-tier exponent measurement, not for row-level diffing.
            continue
        df = gen(base * args.mult, rng)
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            os.path.join(args.out, f"{name}.parquet"),
        )
        print(f"{name}: {len(df)} rows (generator mult={args.mult})")
    print(f"tier ready: {args.out}")


if __name__ == "__main__":
    main()
