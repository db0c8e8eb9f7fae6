#!/usr/bin/env python
"""Generate scaled-up copies of an sf directory for the scale sweep
(SCALING.md): k id-shifted replicas of every table, written as single
parquet files so the streaming file-replay globs keep working.

Replication preserves each operator family's per-unit work profile
instead of manufacturing pathologies:

- keys (order/part/supp/cust/event/user/doc/vec ids) shift by
  k * (max+1): joins and groupings scale in cardinality, no cross-copy
  key collisions;
- document text gets a per-copy suffix token, so near-dup CLUSTERS
  replicate (constant dup-rate) rather than every doc gaining k exact
  twins (which would grow candidate pairs quadratically in k — a
  different, artificial workload);
- embeddings are multiplied by a per-copy Rademacher sign pattern:
  within-copy cosine structure is preserved EXACTLY (cos(s*a, s*b) =
  cos(a, b)) while cross-copy similarity collapses to noise, so ANN /
  dedup candidate volume scales linearly like a real corpus;
- timestamps are untouched: event density per time bucket grows with
  user cardinality, the realistic shape for sessionize/windows.

Usage: python scripts/gen_scaled_fixtures.py SRC_DIR OUT_DIR K
e.g.   python scripts/gen_scaled_fixtures.py /root/testdata/sf0.1 /tmp/sfscale/sf0.2 2
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES_KEYED = {
    # table -> [columns to shift by k*(max(col of its home table)+1)]
    "region": [],
    "nation": [],
    "supplier": ["s_suppkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}

#: which table owns each key's value space (foreign keys shift by the
#: parent's offset so join relationships survive replication)
KEY_HOME = {
    "s_suppkey": ("supplier", "s_suppkey"),
    "c_custkey": ("customer", "c_custkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
}


def main(src: str, out: str, k: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    offs: dict[str, int] = {}
    for key, (home, col) in KEY_HOME.items():
        offs[key] = (
            con.sql(
                f"SELECT max({col})+1 FROM read_parquet('{src}/{home}.parquet')"
            ).fetchone()[0]
            or 0
        )

    for table, keys in TABLES_KEYED.items():
        src_file = f"{src}/{table}.parquet"
        dst = f"{out}/{table}.parquet"
        if not keys:  # fixed-cardinality dimensions: copy through
            con.sql(f"COPY (SELECT * FROM read_parquet('{src_file}')) TO '{dst}' (FORMAT PARQUET)")
            continue
        parts = []
        for i in range(k):
            shifted = ", ".join(
                f"{c} + {i * offs[c]} AS {c}" for c in keys
            )
            others = con.sql(f"SELECT * FROM read_parquet('{src_file}') LIMIT 0").columns
            rest = ", ".join(c for c in others if c not in keys)
            parts.append(
                f"SELECT {shifted}{', ' + rest if rest else ''} "
                f"FROM read_parquet('{src_file}')"
            )
        union = " UNION ALL ".join(parts)
        # re-select in original column order
        cols = ", ".join(con.sql(f"SELECT * FROM read_parquet('{src_file}') LIMIT 0").columns)
        con.sql(f"COPY (SELECT {cols} FROM ({union})) TO '{dst}' (FORMAT PARQUET)")

    # documents: shift ids, per-copy suffix token keeps dup-rate constant
    doc_off = con.sql(
        f"SELECT max(doc_id)+1 FROM read_parquet('{src}/documents.parquet')"
    ).fetchone()[0]
    parts = []
    for i in range(k):
        suffix = "" if i == 0 else f" || ' rep{i}'"
        parts.append(
            f"SELECT doc_id + {i * doc_off} AS doc_id, text{suffix} AS text, "
            f"lang, source, CAST(length(text{suffix}) AS BIGINT) AS n_chars "
            f"FROM read_parquet('{src}/documents.parquet')"
        )
    con.sql(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/documents.parquet' (FORMAT PARQUET)"
    )

    # embeddings: per-copy Rademacher sign flip (numpy; exact within-copy
    # cosine preservation)
    tbl = pq.read_table(f"{src}/embeddings.parquet")
    vecs = np.array(tbl["embedding"].to_pylist(), dtype=np.float32)
    ids = tbl["vec_id"].to_numpy()
    labels = tbl["label"].to_numpy()
    dim = vecs.shape[1]
    out_ids, out_vecs, out_labels = [], [], []
    rng = np.random.RandomState(7)
    vec_off = int(ids.max()) + 1
    for i in range(k):
        signs = np.ones(dim, dtype=np.float32) if i == 0 else rng.choice(
            np.array([-1.0, 1.0], dtype=np.float32), size=dim
        )
        out_ids.append(ids + i * vec_off)
        out_vecs.append(vecs * signs)
        out_labels.append(labels)
    flat = np.concatenate(out_vecs)
    emb_type = tbl.schema.field("embedding").type
    arr = pa.FixedSizeListArray.from_arrays(
        pa.array(flat.reshape(-1), type=pa.float32()), dim
    ) if pa.types.is_fixed_size_list(emb_type) else pa.array(
        [v for v in np.concatenate(out_vecs)], type=emb_type
    )
    out_tbl = pa.table(
        {
            "vec_id": pa.array(np.concatenate(out_ids), type=tbl.schema.field("vec_id").type),
            "embedding": arr,
            "label": pa.array(np.concatenate(out_labels), type=tbl.schema.field("label").type),
        }
    )
    pq.write_table(out_tbl, f"{out}/embeddings.parquet")
    print(f"wrote {out} at {k}x {src}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
