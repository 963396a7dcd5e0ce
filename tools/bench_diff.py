#!/usr/bin/env python3
"""Diff two BENCH_LOCAL.json artifacts: per-query deltas, probe readings,
job-count changes. The round-over-round drift question ("which entries
moved, and did their job counts move with them?") becomes one command:

    python3 tools/bench_diff.py BENCH_prev.json BENCH_LOCAL.json [threshold_sec]
"""
import json
import sys


def load(p):
    with open(p) as f:
        return json.load(f)


def main():
    prev, cur = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 0.3
    pq, cq = prev.get("queries", {}), cur.get("queries", {})
    pj, cj = prev.get("jobs", {}), cur.get("jobs", {})
    print(f"prev: total={prev.get('value')}s load={prev.get('pre_run_load_1m')} "
          f"entries={len(pq)}")
    print(f"cur:  total={cur.get('value')}s load={cur.get('pre_run_load_1m')} "
          f"entries={len(cq)}")
    shared = sorted(set(pq) & set(cq))
    drifts = []
    for n in shared:
        d = cq[n] - pq[n]
        if abs(d) >= thr and not n.startswith("_probe_"):
            jn = ""
            if n in pj and n in cj and pj[n] != cj[n]:
                jn = f"  jobs {pj[n]}->{cj[n]}"
            drifts.append((d, f"{d:+.2f}s  {n}  ({pq[n]:.2f}->{cq[n]:.2f}){jn}"))
    print(f"\nshared-entry drift (|delta| >= {thr}s), slowest-growing first:")
    for _, line in sorted(drifts, key=lambda t: -t[0]):
        print("  " + line)
    both = sum(cq[n] - pq[n] for n in shared if not n.startswith("_probe_"))
    print(f"\nnet shared-entry drift: {both:+.2f}s over {len(shared)} entries")
    added = sorted(set(cq) - set(pq))
    removed = sorted(set(pq) - set(cq))
    if added:
        print(f"added: {', '.join(f'{n} ({cq[n]:.2f}s)' for n in added)}")
    if removed:
        print(f"removed: {', '.join(removed)}")
    probes = {n: cq[n] for n in cq if n.startswith("_probe_")}
    if probes:
        print("\noverhead probes (same trivial job at sweep start/middle/end):")
        for n in sorted(probes):
            print(f"  {n}: {probes[n]:.3f}s")
        a, z = probes.get("_probe_overhead_a"), probes.get("_probe_overhead_z")
        if a is not None and z is not None:
            print(f"  z - a = {z - a:+.3f}s per job of session-state inflation")


if __name__ == "__main__":
    main()
