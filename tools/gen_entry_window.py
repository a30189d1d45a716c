"""Regenerate __spark_entry__.py's _DRIVER_VERIFIED and _WINDOW_50
blocks for the round-14 window.

Window composition (50 slots), per the r13 verdict's asks #2-#4 and
the standing staleness rules (module docstring of __spark_entry__.py):

* 4 CONSUMER PINS — the keys whose executed code this round's edits
  touched: ``sink_merge_partitioned`` + ``sink_delta_merge``
  (plans/merge.py: NULL-part_col fail-fast in the partitioned MERGE;
  keeper exit logging; keeper-interval cap) and ``sim_pq_adc_topk`` +
  ``sim_topk_ivfpq`` (operators/similarity.py: _pq_train's
  repair-under-lease fix).  Consumer sets confirmed mechanically by
  tools/enumerate_consumers.py on the edited code.
* 38 AGE ROTATIONS — every key whose latest verdict is r06/r07 (the
  r13 verdict's ask #2: finish the rotation to a >=r08 floor).
* 8 BONUS ROTATIONS — the oldest r08 verdicts, alphabetical, filling
  the remaining slots.

_DRIVER_VERIFIED is regenerated as (all registered keys) - (window):
after r13 every key has a green verdict on record, and window
membership is what marks a verdict as being re-earned this round.

Usage: python tools/gen_entry_window.py [--check]
  --check: print the proposed window and exit without writing.
"""

from __future__ import annotations

import json
import re
import sys
import textwrap

sys.path.insert(0, "/root/repo")

CONSUMER_PINS = [
    "sink_delta_merge",
    "sink_merge_partitioned",
    "sim_pq_adc_topk",
    "sim_topk_ivfpq",
]


def latest_verdicts() -> dict[str, int]:
    import glob

    latest: dict[str, int] = {}
    for f in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        rnd = int(f.split("_r")[1].split(".")[0])
        for k, v in json.load(open(f)).items():
            if isinstance(v, dict):
                latest[k] = rnd
    return latest


def fmt_block(name: str, items: list[str], braces: str) -> str:
    body = ", ".join(f'"{k}"' for k in items)
    wrapped = textwrap.fill(
        body, width=74, initial_indent="    ", subsequent_indent="    "
    )
    o, c = braces
    return f"{name} = {o}\n{wrapped},\n{c}"


def main() -> int:
    import ingest_sharepoint_file_to_fabric_lakehouse_spark as engine

    engine.load_all()
    keys = set(engine.QUERIES)
    latest = latest_verdicts()
    # pins are excluded from the rotation queues (a pin whose verdict
    # is also old must not appear twice), and the pad slice is floored
    # at 0 (a negative stop would silently produce a WRONG non-empty
    # pad when the age queue alone overflows the window)
    old = sorted(k for k, r in latest.items() if r <= 7 and k not in CONSUMER_PINS)
    if len(CONSUMER_PINS) + len(old) > 50:
        # more aged keys than slots: take the oldest first, rest wait
        old = sorted(old, key=lambda k: (latest[k], k))[: 50 - len(CONSUMER_PINS)]
    r8 = sorted(k for k, r in latest.items() if r == 8)
    pad = [k for k in r8 if k not in old and k not in CONSUMER_PINS][
        : max(0, 50 - len(CONSUMER_PINS) - len(old))
    ]
    window = CONSUMER_PINS + old + pad
    assert len(set(window)) == len(window), "window has duplicate keys"
    assert len(window) <= 50, f"window overflow: {len(window)}"
    missing = [k for k in window if k not in keys]
    assert not missing, f"window keys not in registry: {missing}"
    verified = sorted(keys - set(window))
    if "--check" in sys.argv:
        print(json.dumps({"window": window, "n_verified": len(verified)}, indent=1))
        return 0

    path = "/root/repo/__spark_entry__.py"
    src = open(path).read()
    src = re.sub(
        r"_DRIVER_VERIFIED = \{.*?\n\}",
        fmt_block("_DRIVER_VERIFIED", verified, "{}"),
        src,
        count=1,
        flags=re.S,
    )
    src = re.sub(
        r"_WINDOW_50 = \[.*?\n\]",
        fmt_block("_WINDOW_50", window, "[]"),
        src,
        count=1,
        flags=re.S,
    )
    open(path, "w").write(src)
    print(f"wrote {path}: window={len(window)} verified={len(verified)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
