#!/usr/bin/env python3
"""Compare a local Bench JSON line against a prior round's BENCH_r*.json.

Usage: bench_compare.py <bench_log_with_json_line> <BENCH_rN.json> [slow_threshold_sec]

Prints new queries (absent from the old round), the slowest queries in
the new run, and per-query ratios where both rounds have a number.
"""
import json
import re
import sys


def load_new(path):
    line = None
    for ln in open(path):
        if '"metric"' in ln:
            line = ln[ln.index('{'):]
    if line is None:
        raise SystemExit(f"no metric line in {path}")
    return json.loads(line)


def load_old(path):
    d = json.load(open(path))
    q = d.get("queries") or (d.get("parsed") or {}).get("queries")
    if not q:
        # the driver log truncates; recover per-query pairs from the tail
        q = {k: float(v) for k, v in
             re.findall(r'"(q_[a-z0-9_]+)":([0-9.]+)', d.get("tail", ""))}
    return q


def main():
    new = load_new(sys.argv[1])
    old = load_old(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    nq = new["queries"]
    print(f"total={new['value']:.1f}s over {len(nq)} queries "
          f"(old round: {len(old)} queries)")
    fresh = sorted((v, k) for k, v in nq.items() if k not in old)
    print(f"\n-- new queries ({len(fresh)}):")
    for v, k in reversed(fresh):
        print(f"  {k:40s} {v:7.2f}s")
    print(f"\n-- slowest overall (> {thr}s):")
    for v, k in sorted(((v, k) for k, v in nq.items()), reverse=True):
        if v < thr:
            break
        mark = f"   (r_old {old[k]:.2f}s, x{v / old[k]:.1f})" if k in old else "   (new)"
        print(f"  {k:40s} {v:7.2f}s{mark}")
    regress = [(v / old[k], k, v) for k, v in nq.items()
               if k in old and old[k] > 0.3 and v / old[k] > 2.0]
    print(f"\n-- regressions >2x vs old (old>0.3s): {len(regress)}")
    for r, k, v in sorted(regress, reverse=True):
        print(f"  {k:40s} {old[k]:6.2f}s -> {v:6.2f}s  x{r:.1f}")


if __name__ == "__main__":
    main()
