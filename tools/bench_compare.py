"""Cross-round bench attribution: compare per-query warm timings
between two BENCH_DETAIL_r{N}.json sidecars, splitting the delta into
carried-over / rotated-in / rotated-out, with each side's own load
evidence (ext_cores, per-trial series when present) printed alongside
so a drift can be load-qualified from the artifacts alone.

Round 13+ sidecars carry {queries: medians, queries_min,
queries_spread, trials[]}; older rounds carry best-of-2 single-shot
queries.  The tool labels which protocol each side used.

Usage: python tools/bench_compare.py BENCH_DETAIL_r12.json BENCH_DETAIL_r13.json
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    qa, qb = a.get("queries", {}), b.get("queries", {})
    proto_a = a.get("protocol", "single-shot best-of-2")
    proto_b = b.get("protocol", "single-shot best-of-2")
    carried = sorted(set(qa) & set(qb))
    rot_in = sorted(set(qb) - set(qa))
    rot_out = sorted(set(qa) - set(qb))

    print(f"A: {sys.argv[1]}  protocol={proto_a}  "
          f"value={a.get('value')}  ext_cores={a.get('ext_cores')}")
    print(f"B: {sys.argv[2]}  protocol={proto_b}  "
          f"value={b.get('value')}  ext_cores={b.get('ext_cores')}")
    if "trials" in b:
        print("B per-trial totals:",
              [t.get("value") for t in b["trials"]])
    print()

    tot_a = sum(qa[q] for q in carried)
    tot_b = sum(qb[q] for q in carried)
    print(f"carried-over ({len(carried)}): {tot_a:.2f}s -> {tot_b:.2f}s "
          f"({(tot_b - tot_a) / max(tot_a, 1e-9) * 100:+.1f}%)")
    spread = b.get("queries_spread", {})
    rows = sorted(carried, key=lambda q: qb[q] - qa[q], reverse=True)
    for q in rows[:12]:
        sp = f" spread={spread[q]}" if q in spread else ""
        print(f"  {q:32s} {qa[q]:7.2f} -> {qb[q]:7.2f}  "
              f"({qb[q] - qa[q]:+.2f}){sp}")
    if len(rows) > 12:
        print(f"  ... {len(rows) - 12} more")
    print(f"rotated-in  ({len(rot_in)}): +{sum(qb[q] for q in rot_in):.2f}s "
          f"{rot_in}")
    print(f"rotated-out ({len(rot_out)}): -{sum(qa[q] for q in rot_out):.2f}s "
          f"{rot_out}")


if __name__ == "__main__":
    main()
