"""Parse the latest trace in /tmp/sks_trace: per-track op durations.

Usage: parse_trace.py [N]   (top N ops per track, default 15)"""
import glob
import gzip
import json
import sys
from collections import defaultdict

traces = glob.glob("/tmp/sks_trace/**/*.trace.json.gz", recursive=True)
ev = json.load(gzip.open(traces[0]))["traceEvents"]

pids = {}
tids = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pids[e["pid"]] = e["args"].get("name", "?")
    if e.get("ph") == "M" and e.get("name") == "thread_name":
        tids[(e["pid"], e.get("tid"))] = e["args"].get("name", "?")

by_track = defaultdict(lambda: defaultdict(float))
cnt = defaultdict(lambda: defaultdict(int))
for e in ev:
    if e.get("ph") == "X" and "dur" in e:
        track = (pids.get(e["pid"], e["pid"]),
                 tids.get((e["pid"], e.get("tid")), e.get("tid")))
        by_track[track][e["name"]] += e["dur"]
        cnt[track][e["name"]] += 1

for track, ops in sorted(by_track.items(),
                         key=lambda kv: -sum(kv[1].values())):
    total = sum(ops.values())
    print(f"\n=== track {track}  total {total/1000.0:.3f} ms")
    top = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    for name, d in sorted(ops.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {d/1000.0:9.3f} ms x{cnt[track][name]:4d}  {name[:100]}")
