"""Audit a BENCH_FULL.json for rerun-phase stall contamination.

The r13 signature: reruns executed in descending first-pass-cost
order, and a contiguous host stall inflated samples 2-3 of every key
in ranks ~24-55 by 2-6x while the first passes stayed quiet — i.e.
the MEDIAN rerun/first-pass ratio, bucketed by rerun rank, showed a
clean >2x band.  Protocol v10 (pass interleaving + episode guard)
exists to make that shape impossible to ship silently; this check
makes it mechanical to LOOK for.

Per rank-decile it prints the median s2/s1 and s3/s1 ratios (quiet
expectation: ~0.7-1.0, reruns are warm) and flags any decile whose
median ratio exceeds the threshold in BOTH rerun samples (one sample
can be legitimately hot — interleaving's job), plus the episode-guard
counters.  Exit 1 when a band is flagged.

Usage: python tools/bench_contamination_check.py [BENCH_FULL.json] [--threshold 1.8]
"""

from __future__ import annotations

import json
import os
import statistics
import sys


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    path = args[0] if args else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_FULL.json"
    )
    threshold = 1.8
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            threshold = float(a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1])
    d = json.load(open(path))
    s = d.get("samples", {})
    # rerun order is descending first-pass cost (bench.py); rebuild it
    trip = {k: v for k, v in s.items() if len(v) == 3 and v[0] > 0.02}
    order = sorted(trip, key=lambda k: -trip[k][0])
    n = len(order)
    if n < 20:
        print(f"only {n} 3-sample keys — not enough to band-check")
        return 0
    width = max(10, n // 10)
    flagged = []
    for lo in range(0, n, width):
        grp = order[lo : lo + width]
        m2 = statistics.median(trip[k][1] / trip[k][0] for k in grp)
        m3 = statistics.median(trip[k][2] / trip[k][0] for k in grp)
        hot = m2 > threshold and m3 > threshold
        if hot:
            flagged.append((lo, lo + len(grp) - 1, round(m2, 2), round(m3, 2)))
        print(
            f"ranks {lo:3d}-{lo + len(grp) - 1:3d}: median s2/s1={m2:.2f} "
            f"s3/s1={m3:.2f}{'  << BAND' if hot else ''}"
        )
    g = d.get("episode_guard", {})
    print(
        f"episode_guard: flagged={g.get('flagged')} resampled={g.get('resampled')} "
        f"still_hot={g.get('still_hot')} baseline={g.get('baseline_sec')}s "
        f"(protocol v{d.get('protocol', {}).get('version', '?')})"
    )
    if flagged:
        print(f"CONTAMINATED: {len(flagged)} rank band(s) over {threshold}x in BOTH reruns: {flagged}")
        return 1
    print("clean: no rank band exceeds the threshold in both rerun samples")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
