"""Compare two bench.py JSON outputs and flag per-query regressions.

Usage: python scripts/bench_compare.py BENCH_r01.json BENCH_r02.json
       python bench.py | tee /tmp/bench_now.json
       python scripts/bench_compare.py BENCH_r01.json /tmp/bench_now.json

A query is flagged when new/old exceeds the noise threshold (1.3× —
single-run numbers vary ±30% on this box even best-of-2). Queries
present on only one side are listed as added/removed, not flagged.
Exit code 1 when any regression is flagged, so this can gate commits.
"""

from __future__ import annotations

import json
import sys

THRESHOLD = 1.3


def load(path: str) -> dict:
    """Accept either a raw bench.py line or the driver's BENCH_r{N}.json
    wrapper (bench line under "parsed")."""
    with open(path) as f:
        text = f.read()
    try:
        d = json.loads(text)
        return d.get("parsed", d)
    except json.JSONDecodeError:
        pass
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            return json.loads(line)
    raise SystemExit(f"no bench JSON found in {path}")


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    old, new = load(sys.argv[1]), load(sys.argv[2])
    oq, nq = old.get("queries", {}), new.get("queries", {})
    flagged = []
    for name in sorted(set(oq) | set(nq)):
        if name not in oq:
            print(f"added    {name}: {nq[name]:.3f}s")
        elif name not in nq:
            print(f"removed  {name}: was {oq[name]:.3f}s")
        else:
            ratio = nq[name] / oq[name] if oq[name] else float("inf")
            marker = " <-- REGRESSION" if ratio > THRESHOLD else ""
            if ratio > THRESHOLD:
                flagged.append(name)
            print(f"{'slower' if ratio > 1 else 'faster':8s} {name}: "
                  f"{oq[name]:.3f}s -> {nq[name]:.3f}s ({ratio:.2f}x){marker}")
    shared_old = sum(v for k, v in oq.items() if k in nq)
    shared_new = sum(v for k, v in nq.items() if k in oq)
    if shared_old:
        print(f"\nshared-query total: {shared_old:.3f}s -> {shared_new:.3f}s "
              f"({shared_new / shared_old:.2f}x); "
              f"suite total {old.get('value')}s -> {new.get('value')}s")
    if flagged:
        print(f"\n{len(flagged)} regression(s) over {THRESHOLD}x: {', '.join(flagged)}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
