#!/usr/bin/env python3
"""Normalized cross-round bench comparison (dev tool, like check_oracle.py).

Usage: compare_bench.py <old_BENCH_FULL.json> <new_BENCH_FULL.json> [threshold]

Run-to-run whole-run scaling on this shared host moves every query
proportionally (measured spread: the 250-query common total varied
102.3-120.0 s across five clean isolated runs of identical code — see
BASELINE.md), so a raw per-query diff flags phantom movers whenever the
runs landed on different host conditions. This tool removes the uniform
component first: it rescales the new run by the common-query total ratio,
then flags queries whose NORMALIZED time exceeds threshold x the old
run's single recorded value (default 1.3) — one value per query per
artifact; pass an older BENCH_FULL as <old> to compare against a
different anchor. A real regression survives normalization; a
whole-run shift does not.
"""
import json
import sys


def main(old_path: str, new_path: str, threshold: float = 1.3) -> int:
    old = json.load(open(old_path))["queries"]
    new = json.load(open(new_path))["queries"]
    common = sorted(k for k in old if k in new and old[k] > 0 and new[k] > 0)
    if not common:
        print("no common queries")
        return 2
    so, sn = sum(old[k] for k in common), sum(new[k] for k in common)
    scale = so / sn
    print(f"common {len(common)} queries: old {so:.1f} s, new {sn:.1f} s "
          f"(raw ratio {sn / so:.3f}, normalizing new by {scale:.3f})")
    movers = []
    for k in common:
        norm = new[k] * scale
        if norm > old[k] * threshold and norm - old[k] > 0.1:
            movers.append((k, old[k], new[k], norm))
    if movers:
        print(f"{len(movers)} normalized movers beyond {threshold}x (old -> new [normalized]):")
        for k, o, n, nm in sorted(movers, key=lambda t: -(t[3] / t[1])):
            print(f"  {k}: {o:.2f} -> {n:.2f} [{nm:.2f}]  x{nm / o:.2f}")
    else:
        print(f"no normalized movers beyond {threshold}x — the runs differ only "
              "by uniform whole-run scaling")
    added = sorted(k for k in new if k not in old)
    if added:
        print(f"{len(added)} queries only in new: "
              + ", ".join(f"{k}={new[k]:.2f}s" for k in added))
    return 1 if movers else 0


if __name__ == "__main__":
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    sys.exit(main(sys.argv[1], sys.argv[2], t))
