"""Parse a jax.profiler trace.json.gz: per-track exclusive-time aggregation.

Usage: python tools_parse_trace.py <trace.json.gz> [topN]
Computes SELF time per event (subtracting nested children on the same
thread), then aggregates by base op name per device thread.
"""
import gzip
import json
import re
import sys
from collections import defaultdict


def main():
    path = sys.argv[1]
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    d = json.load(gzip.open(path))
    events = d["traceEvents"]

    proc = {}
    tname = {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                proc[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                tname[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    dev_pids = {p for p, n in proc.items() if "TPU" in str(n)}
    by_track = defaultdict(list)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            by_track[(e["pid"], e.get("tid"))].append(e)

    print("device threads:")
    for k, evs in sorted(by_track.items()):
        total = sum(x.get("dur", 0.0) for x in evs)
        print(f"  pid={k[0]} tid={k[1]} name={tname.get(k, '?')!r} "
              f"events={len(evs)} total={total/1e3:.1f} ms")

    for k, evs in sorted(by_track.items()):
        nm = tname.get(k, "?")
        evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0.0)))
        # compute self time via a stack of (end, child_sum)
        stack = []
        self_time = defaultdict(float)
        count = defaultdict(int)
        for e in evs:
            ts, dur = e["ts"], e.get("dur", 0.0)
            while stack and ts >= stack[-1][0]:
                end, name, dsum, dur0 = stack.pop()
                self_time[name] += dur0 - dsum
                count[name] += 1
                if stack:
                    stack[-1] = (stack[-1][0], stack[-1][1], stack[-1][2] + dur0,
                                 stack[-1][3])
            base = re.sub(r"\.\d+(\.remat\d*)?$", "", e.get("name", "?"))
            base = re.sub(r"\(\d+\)$", "", base)
            stack.append((ts + dur, base, 0.0, dur))
        while stack:
            end, name, dsum, dur0 = stack.pop()
            self_time[name] += dur0 - dsum
            count[name] += 1
            if stack:
                stack[-1] = (stack[-1][0], stack[-1][1], stack[-1][2] + dur0,
                             stack[-1][3])
        total = sum(self_time.values())
        print(f"\n== track {nm!r} (self-time total {total/1e3:.1f} ms) ==")
        rows = sorted(self_time.items(), key=lambda kv: -kv[1])
        for name, t in rows[:topn]:
            print(f"  {t/1e3:9.2f} ms x{count[name]:<6d} {name[:90]}")


if __name__ == "__main__":
    main()
