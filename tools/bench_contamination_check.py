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

Importable as a library (tests/test_bench_artifact.py runs it as a
regression gate over the committed artifact): :func:`check` returns
``(flagged_bands, report_lines)``.

Usage: python tools/bench_contamination_check.py [BENCH_FULL.json] [--threshold 1.8]
"""

from __future__ import annotations

import json
import os
import statistics
import sys

DEFAULT_ARTIFACT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_FULL.json"
)


def check(path: str, threshold: float = 1.8) -> tuple[list, list[str]]:
    """Band-check one BENCH_FULL artifact.  Returns ``(flagged, lines)``:
    ``flagged`` is a list of ``(rank_lo, rank_hi, med_s2s1, med_s3s1)``
    tuples for every rank band whose median rerun/first-pass ratio
    exceeds ``threshold`` in BOTH reruns; ``lines`` the human report."""
    d = json.load(open(path))
    s = d.get("samples", {})
    # rerun order is descending first-pass cost (bench.py); rebuild it
    trip = {k: v for k, v in s.items() if len(v) == 3 and v[0] > 0.02}
    order = sorted(trip, key=lambda k: -trip[k][0])
    n = len(order)
    lines: list[str] = []
    if n < 20:
        lines.append(f"only {n} 3-sample keys — not enough to band-check")
        return [], lines
    width = max(10, n // 10)
    flagged = []
    for lo in range(0, n, width):
        grp = order[lo : lo + width]
        m2 = statistics.median(trip[k][1] / trip[k][0] for k in grp)
        m3 = statistics.median(trip[k][2] / trip[k][0] for k in grp)
        hot = m2 > threshold and m3 > threshold
        if hot:
            flagged.append((lo, lo + len(grp) - 1, round(m2, 2), round(m3, 2)))
        lines.append(
            f"ranks {lo:3d}-{lo + len(grp) - 1:3d}: median s2/s1={m2:.2f} "
            f"s3/s1={m3:.2f}{'  << BAND' if hot else ''}"
        )
    g = d.get("episode_guard", {})
    lines.append(
        f"episode_guard: flagged={g.get('flagged')} resampled={g.get('resampled')} "
        f"still_hot={g.get('still_hot')} baseline={g.get('baseline_sec')}s "
        f"(protocol v{d.get('protocol', {}).get('version', '?')})"
    )
    return flagged, lines


def parse_args(argv: list[str]) -> tuple[str, float]:
    """``--threshold`` accepts both ``--threshold=1.8`` and the space
    form ``--threshold 1.8`` — the value token of the space form must
    NOT leak into the positionals (ADVICE r14: it was then treated as
    the artifact path and json.load crashed)."""
    path = None
    threshold = 1.8
    it = iter(argv)
    for a in it:
        if a == "--threshold":
            threshold = float(next(it))
        elif a.startswith("--threshold="):
            threshold = float(a.split("=", 1)[1])
        elif a.startswith("--"):
            raise SystemExit(f"unknown flag: {a}")
        elif path is None:
            path = a
        else:
            raise SystemExit(f"unexpected extra positional: {a}")
    return path or DEFAULT_ARTIFACT, threshold


def main() -> int:
    path, threshold = parse_args(sys.argv[1:])
    flagged, lines = check(path, threshold)
    for ln in lines:
        print(ln)
    if flagged:
        print(
            f"CONTAMINATED: {len(flagged)} rank band(s) over {threshold}x "
            f"in BOTH reruns: {flagged}"
        )
        return 1
    print("clean: no rank band exceeds the threshold in both rerun samples")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
