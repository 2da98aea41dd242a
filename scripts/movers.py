#!/usr/bin/env python3
"""Mover analysis between two rounds' closing bench artifacts.

Usage:
  movers.py PREV_WARM PREV_WARM2 CUR_WARM CUR_WARM2 [--threshold 1.4]

Emits BOTH the slower- and faster-mover lists from the SAME method
(r18 verdict ask #6 — the r18 README's prose "ten faster" recomputed to
eight by its own stated method; both lists are now generated output):

  per query, round time = min over the two warm artifacts of the
  per-query "min" field (min-of-2 over min-of-reps — the best observed
  steady-state serve); ratio = cur/prev over the COMMON query set;
  slower movers strictly > threshold, faster movers strictly <
  1/threshold.

Headers carry each artifact's corpus_fp (r18 verdict ask #4): the
driver regenerates /root/testdata between rounds, so a cross-round
comparison can straddle parquet generations — when the fingerprints
differ the report labels every mover cross-corpus, the band the
r17/r18 adjudications (t3, d54, j11) each chased by hand. Artifacts
older than r19 predate the stamp and read corpus_fp "unstamped".
"""
import argparse
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    per = {}
    for q, rec in d.get("queries", {}).items():
        # closing artifacts carry {"median","min","runs"}; fall back to
        # a bare number for the stdout-line format
        v = rec.get("min") if isinstance(rec, dict) else rec
        if v is not None and v >= 0:
            per[q] = v
    return d.get("corpus_fp", "unstamped"), per


def round_min(a, b):
    fpa, qa = load(a)
    fpb, qb = load(b)
    fp = fpa if fpa == fpb else f"{fpa}|{fpb}"
    common = set(qa) & set(qb)
    return fp, {q: min(qa[q], qb[q]) for q in common}


def main(argv):
    # argparse (advisor r19): the old hand parser accepted only
    # --threshold=1.4; the space form left "1.4" as a fifth positional
    # and a bare --threshold raised IndexError. argparse takes both
    # forms and emits real usage errors.
    p = argparse.ArgumentParser(
        description="Mover analysis between two rounds' closing bench artifacts")
    p.add_argument("artifacts", nargs=4,
                   metavar=("PREV_WARM PREV_WARM2 CUR_WARM CUR_WARM2"))
    p.add_argument("--threshold", type=float, default=1.4)
    ns = p.parse_args(argv)
    args, thr = ns.artifacts, ns.threshold
    prev_fp, prev = round_min(args[0], args[1])
    cur_fp, cur = round_min(args[2], args[3])
    common = sorted(set(prev) & set(cur))
    movers = []
    for q in common:
        if prev[q] <= 0:
            continue
        movers.append((q, prev[q], cur[q], cur[q] / prev[q]))
    slower = sorted([m for m in movers if m[3] > thr],
                    key=lambda m: -m[3])
    faster = sorted([m for m in movers if m[3] < 1.0 / thr],
                    key=lambda m: m[3])
    rec = lambda m: {"query": m[0], "prev_sec": round(m[1], 3),
                     "cur_sec": round(m[2], 3), "ratio": round(m[3], 2)}
    out = {
        "method": ("min-of-2 over per-query min, common subset, "
                   f"threshold strictly >{thr}x (slower) / "
                   f"<{1/thr:.4f}x (faster)"),
        "prev_corpus_fp": prev_fp,
        "cur_corpus_fp": cur_fp,
        "same_corpus": prev_fp == cur_fp and "unstamped" not in prev_fp,
        "common_n": len(common),
        "total_prev_sec": round(sum(prev[q] for q in common), 2),
        "total_cur_sec": round(sum(cur[q] for q in common), 2),
        "total_ratio": round(sum(cur[q] for q in common)
                             / sum(prev[q] for q in common), 3),
        "n_slower": len(slower),
        "n_faster": len(faster),
        "slower": [rec(m) for m in slower],
        "faster": [rec(m) for m in faster],
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main(sys.argv[1:])
