#!/usr/bin/env python3
"""Build the 100x scaling corpus in /tmp/sfx100 from the sf0.1 testdata.

Same derivation as make_sfx10.py (word-prefixed document replicas,
dimension-rolled embedding replicas, disjoint id ranges) with 100
replicas, streamed one replica per parquet row group so the builder
never holds the 100x corpus in memory.

np.roll alone wraps at the embedding dimensionality (64), which would
make replicas 64-99 exact copies of replicas 0-35 — precisely the
artificial near-dups the derivation must avoid. So the perturbation is
roll by r mod dim COMBINED with a sign flip every wrap: negation is
norm-preserving and anti-aligned (cosine -1), keeping the replica map
injective for any REPLICAS <= 2*dim.
"""
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sfx100"
REPLICAS = 100
ID_STRIDE = 1_000_000


def main():
    os.makedirs(DST, exist_ok=True)

    d = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
    doc_writer = None
    for r in range(REPLICAS):
        c = d.copy()
        c["doc_id"] = c["doc_id"] + r * ID_STRIDE
        if r > 0:
            pref = f"r{r}"
            c["text"] = c["text"].map(
                lambda t: " ".join(pref + w for w in t.split())
                if isinstance(t, str) else t)
        t = pa.Table.from_pandas(c, preserve_index=False)
        if doc_writer is None:
            doc_writer = pq.ParquetWriter(f"{DST}/documents.parquet", t.schema)
        doc_writer.write_table(t)
    doc_writer.close()

    e = pq.read_table(f"{SRC}/embeddings.parquet").to_pandas()
    schema = pa.schema([("vec_id", pa.int64()),
                        ("embedding", pa.list_(pa.float32())),
                        ("label", pa.int32())])
    emb_writer = pq.ParquetWriter(f"{DST}/embeddings.parquet", schema)
    for r in range(REPLICAS):
        c = e.copy()
        c["vec_id"] = c["vec_id"] + r * ID_STRIDE
        if r > 0:
            c["embedding"] = c["embedding"].map(
                lambda v: (np.roll(np.asarray(v, dtype=np.float32),
                                   r % len(v))
                           * (1.0 if (r // len(v)) % 2 == 0 else -1.0)
                           ).astype(np.float32).tolist())
        emb_writer.write_table(pa.Table.from_pandas(
            c[["vec_id", "embedding", "label"]], schema=schema,
            preserve_index=False))
    emb_writer.close()

    # events/orders replicas (the fact↔fact join probes j6/j7/d33),
    # streamed one replica per row group like documents: disjoint
    # user-id ranges keep per-user work constant; disjoint +r*10M price
    # bands keep j7's pair output linear.
    ev = pq.read_table(f"{SRC}/events.parquet").to_pandas()
    eschema = pa.schema([("event_id", pa.int64()), ("ts", pa.timestamp("ns")),
                         ("user_id", pa.int64()), ("event_type", pa.string()),
                         ("value", pa.float64()), ("props", pa.string())])
    ev_writer = pq.ParquetWriter(f"{DST}/events.parquet", eschema)
    for r in range(REPLICAS):
        c = ev.copy()
        c["event_id"] = c["event_id"] + r * ID_STRIDE
        c["user_id"] = c["user_id"] + r * ID_STRIDE
        ev_writer.write_table(pa.Table.from_pandas(c, schema=eschema,
                                                   preserve_index=False))
    ev_writer.close()

    o = pq.read_table(f"{SRC}/orders.parquet").to_pandas()
    oschema = pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
                         ("o_orderstatus", pa.string()),
                         ("o_totalprice", pa.float64()),
                         ("o_orderdate", pa.timestamp("ms")),
                         ("o_orderpriority", pa.string())])
    o_writer = pq.ParquetWriter(f"{DST}/orders.parquet", oschema)
    for r in range(REPLICAS):
        c = o.copy()
        c["o_orderkey"] = c["o_orderkey"] + r * ID_STRIDE
        c["o_custkey"] = c["o_custkey"] + r * ID_STRIDE
        c["o_totalprice"] = c["o_totalprice"] + r * 10_000_000.0
        o_writer.write_table(pa.Table.from_pandas(c, schema=oschema,
                                                  preserve_index=False))
    o_writer.close()

    # customer/lineitem replicas (j8's three-table composition at 100x),
    # streamed one replica per row group like everything else
    cu = pq.read_table(f"{SRC}/customer.parquet").to_pandas()
    cu_writer = None
    for r in range(REPLICAS):
        c = cu.copy()
        c["c_custkey"] = c["c_custkey"] + r * ID_STRIDE
        t = pa.Table.from_pandas(c, preserve_index=False)
        if cu_writer is None:
            cu_writer = pq.ParquetWriter(f"{DST}/customer.parquet", t.schema)
        cu_writer.write_table(t)
    cu_writer.close()

    li = pq.read_table(f"{SRC}/lineitem.parquet").to_pandas()
    li_writer = None
    for r in range(REPLICAS):
        c = li.copy()
        c["l_orderkey"] = c["l_orderkey"] + r * ID_STRIDE
        t = pa.Table.from_pandas(c, preserve_index=False)
        if li_writer is None:
            li_writer = pq.ParquetWriter(f"{DST}/lineitem.parquet", t.schema)
        li_writer.write_table(t)
    li_writer.close()
    print(f"wrote {len(d) * REPLICAS} docs, {len(e) * REPLICAS} embeddings, "
          f"{len(ev) * REPLICAS} events, {len(o) * REPLICAS} orders, "
          f"{len(cu) * REPLICAS} customers, {len(li) * REPLICAS} lineitems "
          f"to {DST}")


if __name__ == "__main__":
    main()
