#!/usr/bin/env python3
"""Build the 10x scaling corpus in /tmp/sfx10 from the sf0.1 testdata.

Ten replicas of documents/embeddings with shifted ids. Replicas are
perturbed so they don't collide as artificial near-duplicates (which
would turn the scaling probe into a pair-explosion stress test instead
of a throughput measurement):

- documents: replica r > 0 prefixes every word with "r{r}" — shingle
  sets across replicas are disjoint while doc length/shape is preserved.
- embeddings: replica r rolls the 64-dim vector by r positions — norms
  and within-replica geometry preserved, cross-replica decorrelated.

Tooling-only (pandas/pyarrow are driver-side deps, not library deps).
"""
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sfx10"
REPLICAS = 10
ID_STRIDE = 1_000_000


def main():
    os.makedirs(DST, exist_ok=True)

    d = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
    reps = []
    for r in range(REPLICAS):
        c = d.copy()
        c["doc_id"] = c["doc_id"] + r * ID_STRIDE
        if r > 0:
            pref = f"r{r}"
            c["text"] = c["text"].map(
                lambda t: " ".join(pref + w for w in t.split())
                if isinstance(t, str) else t)
        reps.append(c)
    big = pd.concat(reps, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(big, preserve_index=False),
                   f"{DST}/documents.parquet")

    e = pq.read_table(f"{SRC}/embeddings.parquet").to_pandas()
    ereps = []
    for r in range(REPLICAS):
        c = e.copy()
        c["vec_id"] = c["vec_id"] + r * ID_STRIDE
        if r > 0:
            c["embedding"] = c["embedding"].map(
                lambda v: np.roll(np.asarray(v, dtype=np.float32), r).tolist())
        ereps.append(c)
    big_e = pd.concat(ereps, ignore_index=True)
    schema = pa.schema([("vec_id", pa.int64()),
                        ("embedding", pa.list_(pa.float32())),
                        ("label", pa.int32())])
    pq.write_table(
        pa.Table.from_pandas(big_e[["vec_id", "embedding", "label"]],
                             schema=schema, preserve_index=False),
        f"{DST}/embeddings.parquet")
    print(f"wrote {len(big)} docs, {len(big_e)} embeddings to {DST}")


if __name__ == "__main__":
    main()
