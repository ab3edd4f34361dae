#!/usr/bin/env python3
"""Diff two BenchScale artifacts (BENCH_sf10.json shape): per-query
median ratios, movers, spill deltas. Usage:
    python3 tools/bench_diff.py OLD.json NEW.json [ratio_threshold]
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    rows = []
    for q in common:
        om, nm = oq[q]["median"], nq[q]["median"]
        osp = max(oq[q].get("spill_disk_mb", [0]))
        nsp = max(nq[q].get("spill_disk_mb", [0]))
        rows.append((q, om, nm, (nm / om if om > 0 else float("inf")), osp, nsp))
    tot_o = sum(r[1] for r in rows)
    tot_n = sum(r[2] for r in rows)
    print(f"common queries: {len(common)}  sum(old)={tot_o:.1f}s  "
          f"sum(new)={tot_n:.1f}s  ratio={tot_n / tot_o:.2f}")
    movers = [r for r in rows if r[3] > thr or (r[3] < 1 / thr and r[1] > 1.0)]
    movers.sort(key=lambda r: -abs(r[3] - 1))
    print(f"\nmovers (ratio >{thr} or <{1/thr:.2f} on >1s queries):")
    for q, om, nm, ratio, osp, nsp in movers:
        sp = f"  spill {osp}->{nsp}MB" if (osp or nsp) else ""
        print(f"  {q:36s} {om:8.2f}s -> {nm:8.2f}s  ({ratio:5.2f}x){sp}")
    print("\nspill deltas (any query with spill in either artifact):")
    for q, om, nm, ratio, osp, nsp in sorted(rows, key=lambda r: -(r[4] + r[5])):
        if osp or nsp:
            print(f"  {q:36s} {osp:8d} -> {nsp:8d} MB   ({om:.1f}s -> {nm:.1f}s)")


if __name__ == "__main__":
    main()
