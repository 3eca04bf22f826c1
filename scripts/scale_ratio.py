#!/usr/bin/env python3
"""Per-query scale-ratio report between two Bench recordings.

Usage: scale_ratio.py BASE.json SCALED.json [volume_factor]

Prints median/p90 of the per-query ratio scaled_time/base_time, the
top movers, and — when volume_factor is given (e.g. 3 for a 30x sweep
against a 10x base) — each top mover's ratio normalized by the volume
factor (1.0 = perfectly volume-linear).
"""
import json
import sys


def main() -> None:
    base = json.load(open(sys.argv[1]))["queries"]
    scaled = json.load(open(sys.argv[2]))["queries"]
    vol = float(sys.argv[3]) if len(sys.argv) > 3 else None
    common = [k for k in scaled if k in base
              and isinstance(base[k], (int, float))
              and isinstance(scaled[k], (int, float))]
    ratios = sorted((scaled[k] / base[k], k) for k in common)
    n = len(ratios)
    med, p90 = ratios[n // 2][0], ratios[int(n * 0.9)][0]
    print(f"{n} common queries  median {med:.2f}x  p90 {p90:.2f}x")
    print(f"totals: base {sum(base[k] for k in common):.1f}s  "
          f"scaled {sum(scaled[k] for k in common):.1f}s")
    print("\ntop movers:")
    for r, k in ratios[-15:][::-1]:
        norm = f"  per-volume {r / vol:.2f}" if vol else ""
        print(f"  {k:38s} {base[k]:7.2f}s -> {scaled[k]:7.2f}s  "
              f"{r:5.2f}x{norm}")


if __name__ == "__main__":
    main()
