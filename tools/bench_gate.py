#!/usr/bin/env python3
"""Calibration-normalized per-query bench gate.

Round 13 established that raw per-query comparisons across rounds are
host-confounded: the same binary ran 0.70 s/query in the r9-r11 host
windows and 0.95 s/query on the r13 host (idle-box adjudication, PLANS
r13). Bench.scala therefore embeds cpu_calib_1t / cpu_calib_32t anchors
(fixed 400M-step xorshift workloads) in every bench.json from r13 on.

This gate divides every per-query time by the run's cpu_calib_32t before
comparing, so a riser is flagged only when the CODE got slower, not the
host:

    normalized(q) = t(q) / cpu_calib_32t

The record baseline is the per-query minimum across every historical
BENCH_r*.json that carries anchors (pre-anchor rounds are unadjudicable
by construction and are skipped), tracked BOTH raw and normalized. A
query is flagged only when BOTH ratios exceed THRESHOLD (1.5):

  - raw ratio > 1.5, normalized <= 1.5  -> the host got slower and the
    calibration moved with it: host drift, excused (the r13 protocol).
  - normalized > 1.5, raw <= 1.5        -> the host got FASTER and the
    query kept its non-CPU constants (per-query overhead, IO, JVM):
    dividing by the calibration over-corrects; not a regression.
  - both > 1.5                          -> slower than the record on a
    comparable-or-faster host: a real regression, flagged.

Usage:  python3 tools/bench_gate.py [current_bench.json]
        (default: bench.json in the repo root)
Exit 0: no flagged queries.  Exit 1: at least one flagged.
"""
import glob
import json
import os
import sys

THRESHOLD = 1.5

def load(path):
    """A bench document is either Bench.scala's own JSON line, or the
    driver's wrapper whose `tail` field embeds (a possibly TRUNCATED
    copy of) that line as raw text. Truncated tails still yield a
    partial per-query record via regex — per-query records compose from
    whatever survived."""
    import re
    with open(path) as f:
        doc = json.load(f)
    if "queries" in doc:
        return doc
    tail = doc.get("tail") or ""
    i = tail.find('{"metric"')
    if i >= 0:
        line = tail[i:].splitlines()[0]
        try:
            return json.loads(line)
        except Exception:
            pass
    qs = {m.group(1): float(m.group(2)) for m in
          re.finditer(r'"(q\w+)":([0-9.]+)', tail)}
    calib = re.search(r'"cpu_calib_32t":([0-9.]+)', tail)
    return {"queries": qs,
            "cpu_calib_32t": float(calib.group(1)) if calib else None}

def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cur_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(root, "bench.json")
    cur = load(cur_path)
    cur_calib = cur.get("cpu_calib_32t")
    if not cur_calib:
        print(f"[gate] {cur_path} has no cpu_calib_32t anchor — cannot "
              "normalize; run a Bench build that emits anchors (r13+)")
        return 1

    # normalized per-query records across anchored historical rounds:
    # the driver's BENCH_r*.json wrappers plus BENCH_RECORDS.jsonl, the
    # full bench lines this gate snapshots at each round close
    records = {}
    rounds_used = []
    docs = []
    for p in sorted(glob.glob(os.path.join(root, "BENCH_r*.json"))):
        try:
            docs.append((os.path.basename(p), load(p)))
        except Exception:
            continue
    rec_path = os.path.join(root, "BENCH_RECORDS.jsonl")
    if os.path.exists(rec_path):
        with open(rec_path) as f:
            for i, line in enumerate(f):
                try:
                    docs.append((f"records[{i}]", json.loads(line)))
                except Exception:
                    continue
    raw_records = {}
    for tag, b in docs:
        calib = b.get("cpu_calib_32t")
        qs = b.get("queries") or {}
        if not calib or not qs:
            continue
        rounds_used.append(tag)
        for q, t in qs.items():
            n = t / calib
            if q not in records or n < records[q][0]:
                records[q] = (n, tag)
            if q not in raw_records or t < raw_records[q]:
                raw_records[q] = t

    if not records:
        print("[gate] no anchored historical rounds found — recording "
              f"{cur_path} as the first baseline, nothing to flag")
        return 0

    flagged, table = [], []
    for q, t in sorted((cur.get("queries") or {}).items()):
        n = t / cur_calib
        if q not in records:
            table.append((q, t, None, None, None, "new"))
            continue
        rec_n, rec_round = records[q]
        raw_ratio = t / raw_records[q] if raw_records[q] > 0 else 0.0
        norm_ratio = n / rec_n if rec_n > 0 else 0.0
        mark = "FLAG" if min(raw_ratio, norm_ratio) > THRESHOLD else ""
        if mark:
            flagged.append(q)
        table.append((q, t, raw_ratio, norm_ratio, rec_round, mark))

    print(f"[gate] current: {cur_path}  calib_32t={cur_calib}  "
          f"records from: {', '.join(rounds_used)}")
    print(f"{'query':<36}{'sec':>8}{'xraw':>7}{'xnorm':>7}  record-round  flag")
    for q, t, raw_r, norm_r, rr, mark in sorted(
            table, key=lambda r: -min(r[2] or 0, r[3] or 0)):
        rw = f"{raw_r:.2f}" if raw_r is not None else "  —"
        ns = f"{norm_r:.2f}" if norm_r is not None else "  —"
        print(f"{q:<36}{t:>8.2f}{rw:>7}{ns:>7}  {rr or '—':<12}  {mark}")
    print(f"[gate] {len(flagged)} flagged of {len(table)} queries "
          f"(BOTH raw and normalized ratio > {THRESHOLD}x)")
    if flagged:
        print("[gate] flagged: " + ", ".join(flagged))
    return 1 if flagged else 0

if __name__ == "__main__":
    sys.exit(main())
