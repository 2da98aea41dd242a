#!/usr/bin/env python3
"""Build the 3x GRAPH scaling corpus in /tmp/sfx3graph from sf0.1.

Three time-DISJOINT replicas of events (replica r shifts user_id by
r*10^6, event_id by r*10^8, and ts by r*370 days), every other table
symlinked from sf0.1. Disjoint time windows mean sessions NEVER overlap
across replicas, so the co-presence graph is exactly three disjoint
copies of the base graph — a faithful 3x graph for probing the
distributed component/LPA kernels. (The sfx10 replica corpus is
UNUSABLE for graph ops: its replicated hour lattice makes the
co-presence graph quasi-complete — the r11 postmortem — which this
layout avoids by construction.)

Tooling-only (pandas/pyarrow are driver-side deps, not library deps).
"""
import os
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sfx3graph"
REPLICAS = 3
USER_STRIDE = 1_000_000
EVENT_STRIDE = 100_000_000
TS_STRIDE = pd.Timedelta(days=370)

os.makedirs(DST, exist_ok=True)
ev = pq.read_table(os.path.join(SRC, "events.parquet")).to_pandas()
parts = []
for r in range(REPLICAS):
    rep = ev.copy()
    rep["user_id"] = rep["user_id"] + r * USER_STRIDE
    rep["event_id"] = rep["event_id"] + r * EVENT_STRIDE
    rep["ts"] = rep["ts"] + r * TS_STRIDE
    parts.append(rep)
out = pd.concat(parts, ignore_index=True)
pq.write_table(pa.Table.from_pandas(out, preserve_index=False),
               os.path.join(DST, "events.parquet"))
for f in os.listdir(SRC):
    if f == "events.parquet":
        continue
    dst = os.path.join(DST, f)
    if not os.path.exists(dst):
        os.symlink(os.path.join(SRC, f), dst)
print(f"{DST}: events x{REPLICAS} = {len(out)} rows, rest symlinked")
