"""Turn the tunnel-watcher's queued probe outputs into flip decisions.

The recovery watcher (session notes, CLAUDE.md) writes one JSON file
per probe to /tmp/bench_*.json. This reads whatever landed and prints
a decision table: per variant, its headline number, the delta vs the
two baseline runs, and whether it clears the flip bar.

Flip rule (CLAUDE.md): a chain default flips ONLY on a bench.py win
that exceeds the baseline's own run-to-run spread — base vs base2
measures that spread; a variant must beat max(base, base2) by more
than |base - base2| to count as a win rather than tunnel jitter.

Usage:  python tools/analyze_probes.py [dir=/tmp]
"""

from __future__ import annotations

import json
import os
import sys

PROBES = {
    "bench_base.json": ("baseline", None),
    "bench_base2.json": ("baseline repeat", None),
    "bench_eb8.json": ("envelope_block=8", "envelope kernel block lookahead"),
    "bench_eb16.json": ("envelope_block=16", "envelope kernel block lookahead"),
    "bench_pad.json": ("mixfirst_pad", "lane-pad 441->512 resample operand"),
    "bench_eb8pad.json": ("eb8 + pad combo", "both front-end flips"),
}


def main(d: str = "/tmp") -> int:
    vals: dict[str, float] = {}
    for fname, (label, _) in PROBES.items():
        path = os.path.join(d, fname)
        if not os.path.exists(path) or os.path.getsize(path) == 0:
            continue
        try:
            with open(path) as f:
                vals[fname] = float(json.load(f)["value"])
        except Exception as e:  # truncated/garbled probe output
            print(f"{label:24s} UNREADABLE ({e})")
    if "bench_base.json" not in vals:
        print("no baseline landed yet — nothing to compare")
        return 1
    base = vals["bench_base.json"]
    base2 = vals.get("bench_base2.json", base)
    spread = abs(base - base2)
    bar = max(base, base2) + spread
    print(f"baseline {base:,.0f} / repeat {base2:,.0f} "
          f"(spread {spread:,.0f}) -> flip bar {bar:,.0f}\n")
    for fname, (label, note) in PROBES.items():
        if note is None or fname not in vals:
            continue
        v = vals[fname]
        verdict = "FLIP" if v > bar else "no (jitter-level or slower)"
        print(f"{label:24s} {v:>10,.0f}  {v / base - 1.0:+7.1%}  {verdict}")
    for extra in ("bench_c3.json", "bench_c5.json", "bench_kvar.json"):
        p = os.path.join(d, extra)
        if os.path.exists(p) and os.path.getsize(p):
            print(f"\n{extra}: {open(p).read().strip()[:400]}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp"))
