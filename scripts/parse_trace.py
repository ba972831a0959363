#!/usr/bin/env python
"""Aggregate per-op device time from a jax.profiler trace directory.

Usage: python scripts/parse_trace.py /tmp/encoder_trace [top_n]

Sums duration by event name on TPU device tracks (pid whose track name
mentions TPU/device core), prints the top-N ops and the total — the
breakdown that decides which fusion to attack next.
"""
import glob
import gzip
import json
import sys
from collections import defaultdict


def main():
    root = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    paths = glob.glob(root + "/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace files under", root)
        return
    path = max(paths)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # identify device pids: process_name metadata containing "TPU" and not
    # "host"; axon tunnels label the core track "/device:TPU:0" or similar
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {
        p for p, n in pid_names.items()
        if ("TPU" in n or "tpu" in n or "Device" in n) and "Host" not in n
    }
    if not dev_pids:  # fall back: every pid that has X events with "fusion"
        dev_pids = set(pid_names)
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        tot[name] += e.get("dur", 0.0)
        cnt[name] += 1
    items = sorted(tot.items(), key=lambda kv: -kv[1])
    grand = sum(tot.values())
    print(f"{path}\ntotal device time: {grand/1e3:.3f} ms "
          f"(all iterations summed)")
    for name, dur in items[:top_n]:
        print(f"{dur/1e3:9.3f} ms  x{cnt[name]:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
