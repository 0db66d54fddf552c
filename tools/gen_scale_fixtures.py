#!/usr/bin/env python
"""Deterministically scale the driver's sf0.1 fixtures to sf1 / sf10 / sf100.

The driver generates sf∈{0.001,0.01,0.1} (TESTDATA.md); everything
above is extrapolation unless we measure it.  This tool replicates
sf0.1 R× with key remapping so referential integrity, per-key fanout
and value distributions are preserved at 10×/100× the rows:

- **Fact/dim keys shift by replica**: replica ``i`` adds ``i*max_keys``
  to custkey/orderkey/partkey/suppkey/event_id/user_id/doc_id/vec_id,
  so orders→customer, lineitem→{orders,part,supplier} FKs stay valid
  and per-customer / per-order / per-user group sizes match the
  original (group COUNT distribution is scale-invariant; the NUMBER of
  groups grows linearly, which is how real corpora scale).
- **Names regenerate from the new key** (Customer#%09d etc).
- **documents**: replica ``i`` maps every word through a vocabulary
  permutation seeded by ``i`` — within-replica exact/near-dup structure
  is preserved exactly (dup docs map to dup docs), while cross-replica
  similarity is destroyed so dedup candidate density per doc stays
  constant instead of exploding quadratically (a fixture artifact, not
  a workload property).  n_chars is recomputed from the permuted text.
- **embeddings**: replica ``i`` adds N(0, 0.02) jitter from a seeded
  rng — same 10-cluster geometry, no exact-duplicate vectors.
- **events**: same 30-day window at i× event density (user_id space
  grows; timestamps keep their distribution so window/sessionize costs
  scale with data, not with calendar span).
- region/nation are genuinely fixed-size dims: copied as-is.

Everything is seeded — two runs produce byte-identical tables.

Usage: python tools/gen_scale_fixtures.py [--out /root/repo/fixtures] [--sf 1 10]
"""

from __future__ import annotations

import argparse
import os
import shutil

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# key-space sizes in the sf0.1 fixtures (max key + 1, verified)
K = {
    "cust": 15_000,
    "supp": 1_000,
    "part": 20_000,
    "order": 150_000,
    "event": 100_000,
    "user": 1_500,
    "doc": 5_000,
    "vec": 2_000,
}


def _copy(src_dir: str, out_dir: str, name: str) -> None:
    shutil.copyfile(
        os.path.join(src_dir, f"{name}.parquet"), os.path.join(out_dir, f"{name}.parquet")
    )


# above this many replicas, write each table as a DIRECTORY of parquet
# parts (one COPY per chunk of replicas) so memory stays bounded at
# ~chunk-size regardless of r; Spark reads `name.parquet/` dirs natively.
CHUNK_REPLICAS = 100


def _duck_scale(con: duckdb.DuckDBPyConnection, out_dir: str, r: int) -> None:
    """Replicate the relational tables r× with key offsets (pure SQL,
    vectorized, deterministic).  Large r is chunked into a parquet
    directory so the working set never exceeds CHUNK_REPLICAS copies."""

    def gen(name: str, select: str) -> None:
        if r <= CHUNK_REPLICAS:
            reps = f"(SELECT unnest(range({r})) AS _r)"
            con.execute(
                f"COPY (SELECT {select} FROM read_parquet('{SRC}/{name}.parquet') "
                f"CROSS JOIN {reps} ORDER BY _r) "
                f"TO '{out_dir}/{name}.parquet' (FORMAT PARQUET)"
            )
            return
        part_dir = os.path.join(out_dir, f"{name}.parquet")
        os.makedirs(part_dir, exist_ok=True)
        for j, lo in enumerate(range(0, r, CHUNK_REPLICAS)):
            hi = min(lo + CHUNK_REPLICAS, r)
            reps = f"(SELECT unnest(range({lo}, {hi})) AS _r)"
            con.execute(
                f"COPY (SELECT {select} FROM read_parquet('{SRC}/{name}.parquet') "
                f"CROSS JOIN {reps} ORDER BY _r) "
                f"TO '{part_dir}/part-{j:05d}.parquet' (FORMAT PARQUET)"
            )

    gen(
        "customer",
        f"c_custkey + _r*{K['cust']} AS c_custkey, "
        f"printf('Customer#%09d', c_custkey + _r*{K['cust']}) AS c_name, "
        "c_nationkey, c_acctbal, c_mktsegment",
    )
    gen(
        "supplier",
        f"s_suppkey + _r*{K['supp']} AS s_suppkey, "
        f"printf('Supplier#%09d', s_suppkey + _r*{K['supp']}) AS s_name, "
        "s_nationkey, s_acctbal",
    )
    gen(
        "part",
        f"p_partkey + _r*{K['part']} AS p_partkey, "
        "p_name, p_brand, p_type, p_size, p_retailprice",
    )
    gen(
        "orders",
        f"o_orderkey + _r*{K['order']} AS o_orderkey, "
        f"o_custkey + _r*{K['cust']} AS o_custkey, "
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority",
    )
    gen(
        "lineitem",
        f"l_orderkey + _r*{K['order']} AS l_orderkey, "
        f"l_partkey + _r*{K['part']} AS l_partkey, "
        f"l_suppkey + _r*{K['supp']} AS l_suppkey, "
        "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        "l_returnflag, l_linestatus, l_shipdate",
    )
    gen(
        "events",
        f"event_id + _r*{K['event']} AS event_id, ts, "
        f"user_id + _r*{K['user']} AS user_id, event_type, value, props",
    )


def _scale_documents(out_dir: str, r: int) -> None:
    tbl = pq.read_table(os.path.join(SRC, "documents.parquet"))
    texts = tbl.column("text").to_pylist()
    langs = tbl.column("lang").to_pylist()
    sources = tbl.column("source").to_pylist()
    toks = [t.split(" ") for t in texts]  # tokenize once, reuse per replica
    vocab = sorted({w for t in toks for w in t})
    n = len(texts)
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )

    def replica(i: int) -> pa.Table:
        if i == 0:
            mapped = texts
        else:
            rng = np.random.default_rng(7_000 + i)
            perm = rng.permutation(len(vocab))
            wmap = {w: vocab[perm[j]] for j, w in enumerate(vocab)}
            mapped = [" ".join(map(wmap.__getitem__, t)) for t in toks]
        return pa.table(
            {
                "doc_id": pa.array(
                    [d + i * K["doc"] for d in range(n)], pa.int64()
                ),
                "text": pa.array(mapped, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "source": pa.array(sources, pa.string()),
                "n_chars": pa.array([len(t) for t in mapped], pa.int64()),
            }
        )

    # streaming writer, bounded memory.  Row-group batching is
    # adaptive: at least ~8 row groups per file so scans parallelize
    # at EVERY SF (a one-row-group file is a one-task scan — the
    # ingest_native hazard, SCALE.md §2/§10), capped at 20 replicas
    # per group so big SFs keep efficiently-sized groups.
    per_group = max(1, min(20, r // 8))
    with pq.ParquetWriter(os.path.join(out_dir, "documents.parquet"), schema) as w:
        batch: list[pa.Table] = []
        for i in range(r):
            batch.append(replica(i))
            if len(batch) >= per_group or i == r - 1:
                w.write_table(pa.concat_tables(batch))
                batch = []


def _scale_embeddings(out_dir: str, r: int) -> None:
    tbl = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    base = np.array(tbl.column("embedding").to_pylist(), dtype=np.float32)
    labels = np.array(tbl.column("label").to_pylist(), dtype=np.int32)
    n, dim = base.shape
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )

    def replica(i: int) -> pa.Table:
        v = base.copy()
        if i > 0:
            v += np.random.default_rng(9_000 + i).normal(0, 0.02, v.shape).astype(
                np.float32
            )
        return pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64) + i * K["vec"]),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(v.reshape(-1), pa.float32()), dim
                ).cast(pa.list_(pa.float32())),
                "label": pa.array(labels),
            }
        )

    per_group = max(1, min(20, r // 8))
    with pq.ParquetWriter(os.path.join(out_dir, "embeddings.parquet"), schema) as w:
        batch: list[pa.Table] = []
        for i in range(r):
            batch.append(replica(i))
            if len(batch) >= per_group or i == r - 1:
                w.write_table(pa.concat_tables(batch))
                batch = []


def generate(out_root: str, sf: float) -> str:
    r = round(sf / 0.1)
    out_dir = os.path.join(out_root, f"sf{sf:g}")
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    _copy(SRC, out_dir, "region")
    _copy(SRC, out_dir, "nation")
    _duck_scale(con, out_dir, r)
    _scale_documents(out_dir, r)
    _scale_embeddings(out_dir, r)
    with open(marker, "w") as f:
        f.write(f"scaled {r}x from {SRC}\n")
    return out_dir


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/fixtures")
    ap.add_argument("--sf", nargs="+", type=float, default=[1.0, 10.0])
    args = ap.parse_args()
    for sf in args.sf:
        d = generate(args.out, sf)
        total = sum(
            os.path.getsize(os.path.join(d, f)) for f in os.listdir(d)
        )
        print(f"sf{sf:g}: {d} ({total/1e6:.0f} MB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
