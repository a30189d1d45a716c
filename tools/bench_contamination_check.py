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


def band_stats(data: dict) -> list[dict]:
    """Per-rank-decile drift statistics of one BENCH_FULL-shaped dict.

    Reruns execute in descending first-pass-cost order (bench.py);
    rebuild that order and report, per decile of it, the median s2/s1
    and s3/s1 rerun/first-pass ratios (quiet expectation ~0.7-1.0).
    Sub-threshold host drift — e.g. the r15 driver host's uniform
    1.19-1.20 late-rank bands — is visible HERE without tripping the
    contamination flag, which is why bench.py records this list into
    the artifact's ``drift_bands`` field at write time (r15 verdict
    ask #4).  Returns ``[]`` when there are fewer than 20 3-sample
    keys to band over.
    """
    s = data.get("samples", {})
    trip = {k: v for k, v in s.items() if len(v) == 3 and v[0] > 0.02}
    # tie-break by key name: rank order must be TOTAL, or the band
    # boundaries depend on dict iteration order and the recorded
    # bands stop matching a recomputation after the sort_keys JSON
    # round-trip (many sub-0.1s keys tie at 3 decimals)
    order = sorted(trip, key=lambda k: (-trip[k][0], k))
    n = len(order)
    if n < 20:
        return []
    width = max(10, n // 10)
    bands = []
    for lo in range(0, n, width):
        grp = order[lo : lo + width]
        bands.append(
            {
                "rank_lo": lo,
                "rank_hi": lo + len(grp) - 1,
                "s2_s1_median": round(
                    statistics.median(trip[k][1] / trip[k][0] for k in grp), 3
                ),
                "s3_s1_median": round(
                    statistics.median(trip[k][2] / trip[k][0] for k in grp), 3
                ),
            }
        )
    return bands


def check(path: str, threshold: float = 1.8) -> tuple[list, list[str]]:
    """Band-check one BENCH_FULL artifact.  Returns ``(flagged, lines)``:
    ``flagged`` is a list of ``(rank_lo, rank_hi, med_s2s1, med_s3s1)``
    tuples for every rank band whose median rerun/first-pass ratio
    exceeds ``threshold`` in BOTH reruns; ``lines`` the human report."""
    d = json.load(open(path))
    bands = band_stats(d)
    lines: list[str] = []
    if not bands:
        n = sum(
            1
            for v in d.get("samples", {}).values()
            if len(v) == 3 and v[0] > 0.02
        )
        lines.append(f"only {n} 3-sample keys — not enough to band-check")
        return [], lines
    flagged = []
    for b in bands:
        m2, m3 = b["s2_s1_median"], b["s3_s1_median"]
        hot = m2 > threshold and m3 > threshold
        if hot:
            flagged.append((b["rank_lo"], b["rank_hi"], round(m2, 2), round(m3, 2)))
        lines.append(
            f"ranks {b['rank_lo']:3d}-{b['rank_hi']:3d}: median s2/s1={m2:.2f} "
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
        if a == "--threshold" or a.startswith("--threshold="):
            # both bad-value shapes get the same clean usage error the
            # other flags raise (ADVICE r15: a missing value crashed
            # with a raw StopIteration, a non-numeric one with a raw
            # ValueError traceback)
            try:
                raw = a.split("=", 1)[1] if "=" in a else next(it)
                threshold = float(raw)
            except (StopIteration, ValueError):
                raise SystemExit("--threshold requires a numeric value")
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
