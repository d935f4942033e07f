"""Build a larger-scale replica of a driver testdata dir for LOCAL
measurement only (the driver generates its own data; this never feeds
a recorded artifact's correctness claim without saying so).

Replicates each table K times with key shifts that keep per-replica
referential integrity (orders->customer, lineitem->orders/part/supp)
and perturbs free-text/vector payloads deterministically so the
replicas are not trivial exact duplicates (near-dup tiers would
otherwise see clusters of K identical docs that the driver's fresh
generator does not produce).

Usage: python scripts/make_sf_replica.py SRC_DIR DST_DIR K
e.g.   python scripts/make_sf_replica.py /root/testdata/sf0.1 /root/sf1.0 10
"""

from __future__ import annotations

import os
import sys

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

ROW_GROUP = 1 << 20  # mimic the driver's one-big-row-group layout


def _mangle_text(texts: pa.ChunkedArray, k: int) -> pa.Array:
    """Deterministically rewrite ~half the tokens per replica so
    replicas are far apart in simhash/minhash space (k=0 unchanged)."""
    if k == 0:
        return texts.combine_chunks()
    out = []
    tag = f"{k:x}"
    for t in texts.to_pylist():
        words = t.split(" ")
        words = [
            (w + tag) if ((zlib.crc32(w.encode()) ^ k) & 1) else w
            for w in words
        ]
        out.append(" ".join(words))
    return pa.array(out, type=pa.string())


def replicate(src: str, dst: str, K: int) -> None:
    os.makedirs(dst, exist_ok=True)
    tables = [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]
    for name in tables:
        sp = os.path.join(src, f"{name}.parquet")
        if not os.path.exists(sp):
            continue
        t = pq.read_table(sp)
        n = t.num_rows
        if name in ("region", "nation"):
            pq.write_table(t, os.path.join(dst, f"{name}.parquet"),
                           row_group_size=ROW_GROUP)
            continue
        reps = []
        for k in range(K):
            cols = {}
            for field in t.schema:
                c = t.column(field.name)
                if field.name in ("c_custkey", "s_suppkey", "p_partkey",
                                  "o_orderkey", "o_custkey", "l_orderkey",
                                  "l_partkey", "l_suppkey", "doc_id",
                                  "vec_id", "event_id", "user_id"):
                    # shift by k * (table-size for the key's table)
                    base = {
                        "c_custkey": 15000, "o_custkey": 15000,
                        "s_suppkey": 1000, "l_suppkey": 1000,
                        "p_partkey": 20000, "l_partkey": 20000,
                        "o_orderkey": 150000, "l_orderkey": 150000,
                        "doc_id": 5000, "vec_id": 2000,
                        "event_id": 100000, "user_id": 1000000000,
                    }[field.name]
                    cols[field.name] = pc.add(
                        c, pa.scalar(k * base, type=field.type))
                elif name == "documents" and field.name == "text":
                    cols[field.name] = _mangle_text(c, k)
                elif name == "embeddings" and field.name == "embedding":
                    if k == 0:
                        cols[field.name] = c.combine_chunks()
                    else:
                        arr = c.combine_chunks()
                        flat = arr.flatten().to_numpy(zero_copy_only=False)
                        rng = np.random.default_rng(k)
                        flat = flat + rng.normal(0, 0.05, flat.shape)
                        offs = arr.offsets
                        cols[field.name] = pa.ListArray.from_arrays(
                            offs, pa.array(flat, type=arr.type.value_type))
                else:
                    cols[field.name] = c.combine_chunks()
            # recompute n_chars after text mangle
            if name == "documents":
                cols["n_chars"] = pc.cast(
                    pc.utf8_length(cols["text"]),
                    t.schema.field("n_chars").type)
            reps.append(pa.table(
                {f.name: cols[f.name] for f in t.schema}, schema=t.schema))
        out = pa.concat_tables(reps)
        pq.write_table(out, os.path.join(dst, f"{name}.parquet"),
                       row_group_size=ROW_GROUP)
        print(f"{name}: {n} -> {out.num_rows}")


if __name__ == "__main__":
    replicate(sys.argv[1], sys.argv[2], int(sys.argv[3]))
