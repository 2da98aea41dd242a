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
SKEW_DST = "/tmp/sfx10skew"
REPLICAS = 10
ID_STRIDE = 1_000_000
HOT_USER = 7  # replica-0 user that owns ~20% of all clicks in the skew dir


def replicate_events(skew: bool) -> pd.DataFrame:
    """10 event replicas with disjoint event/user id ranges (events-per-
    user stays constant, so per-user work is constant and j6's total is
    linear). With skew=True, every 5th click row — 20% of ALL clicks —
    is reassigned to one replica-0 user: the bot-traffic key that made
    the old join-formulation j6 quadratic."""
    e = pq.read_table(f"{SRC}/events.parquet").to_pandas()
    reps = []
    for r in range(REPLICAS):
        c = e.copy()
        c["event_id"] = c["event_id"] + r * ID_STRIDE
        c["user_id"] = c["user_id"] + r * ID_STRIDE
        reps.append(c)
    big = pd.concat(reps, ignore_index=True)
    if skew:
        clicks = big["event_type"] == "click"
        hot = clicks & (np.arange(len(big)) % 5 == 0)
        big.loc[hot, "user_id"] = HOT_USER
    return big


def write_events(df: pd.DataFrame, dst: str):
    schema = pa.schema([("event_id", pa.int64()), ("ts", pa.timestamp("ns")),
                        ("user_id", pa.int64()), ("event_type", pa.string()),
                        ("value", pa.float64()), ("props", pa.string())])
    pq.write_table(pa.Table.from_pandas(df, schema=schema,
                                        preserve_index=False),
                   f"{dst}/events.parquet")


def main():
    os.makedirs(DST, exist_ok=True)
    os.makedirs(SKEW_DST, exist_ok=True)

    # events: plain 10x in DST; hot-user variant in SKEW_DST (j6 probe)
    write_events(replicate_events(skew=False), DST)
    write_events(replicate_events(skew=True), SKEW_DST)

    # orders: 10 replicas, each shifted into a DISJOINT price band
    # (+r*10M, far above the ~500k price ceiling) so j7's 1-cent band
    # join finds exactly 10x the within-replica pairs — output scales
    # linearly and the probe measures the PLAN, not pair-count blowup.
    o = pq.read_table(f"{SRC}/orders.parquet").to_pandas()
    oreps = []
    for r in range(REPLICAS):
        c = o.copy()
        c["o_orderkey"] = c["o_orderkey"] + r * ID_STRIDE
        c["o_custkey"] = c["o_custkey"] + r * ID_STRIDE
        c["o_totalprice"] = c["o_totalprice"] + r * 10_000_000.0
        oreps.append(c)
    big_o = pd.concat(oreps, ignore_index=True)
    oschema = pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
                         ("o_orderstatus", pa.string()),
                         ("o_totalprice", pa.float64()),
                         ("o_orderdate", pa.timestamp("ms")),
                         ("o_orderpriority", pa.string())])
    pq.write_table(pa.Table.from_pandas(big_o, schema=oschema,
                                        preserve_index=False),
                   f"{DST}/orders.parquet")

    # customer/lineitem replicas (j8's three-table composition probe):
    # disjoint key ranges; lineitem keeps its order linkage by shifting
    # l_orderkey with the same stride orders uses.
    cu = pq.read_table(f"{SRC}/customer.parquet").to_pandas()
    cureps = []
    for r in range(REPLICAS):
        c = cu.copy()
        c["c_custkey"] = c["c_custkey"] + r * ID_STRIDE
        cureps.append(c)
    pq.write_table(pa.Table.from_pandas(pd.concat(cureps, ignore_index=True),
                                        preserve_index=False),
                   f"{DST}/customer.parquet")

    li = pq.read_table(f"{SRC}/lineitem.parquet").to_pandas()
    lireps = []
    for r in range(REPLICAS):
        c = li.copy()
        c["l_orderkey"] = c["l_orderkey"] + r * ID_STRIDE
        lireps.append(c)
    pq.write_table(pa.Table.from_pandas(pd.concat(lireps, ignore_index=True),
                                        preserve_index=False),
                   f"{DST}/lineitem.parquet")

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
    print(f"wrote {len(big)} docs, {len(big_e)} embeddings, "
          f"{len(big_o)} orders, plus events to {DST} "
          f"(skewed events to {SKEW_DST})")


if __name__ == "__main__":
    main()
