"""Compare two bench.py JSON outputs and flag per-query regressions.

Usage: python scripts/bench_compare.py BENCH_r01.json BENCH_r02.json
       python bench.py | tee /tmp/bench_now.json
       python scripts/bench_compare.py BENCH_r01.json /tmp/bench_now.json

A query is flagged when new/old exceeds the noise threshold (1.3× —
single-run numbers vary ±30% on this box even best-of-2). Queries
present on only one side are listed as added/removed, not flagged.
Exit code 1 when any regression is flagged, so this can gate commits.

Box-speed adjudication (VERDICT r8 directive #4): the lead block
normalizes the new raw total by BOTH calibration probes
(``calibration_seconds`` single-core, ``calibration_parallel_seconds``
all-core): code-reads = raw_new × probe_old / probe_new. When the two
normalizations disagree by more than PROBE_DISAGREE (5%), the box
changed in a way no single scalar captures — the rule encoded here
(BENCH_NOTES r8, the bench_r8b reading) is that NEITHER raw total is a
code claim; only per-query movers ≥ THRESHOLD get adjudicated.
"""

from __future__ import annotations

import json
import sys

THRESHOLD = 1.3
PROBE_DISAGREE = 0.05


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


def print_probe_lead(old: dict, new: dict) -> None:
    """Lead block: both probe ratios, both normalized totals, and the
    disagreement verdict — the one-command adjudication BENCH_NOTES
    previously did by hand."""
    raw = new.get("value")
    if raw is None:
        return
    norms = {}
    for key, label in (
        ("calibration_seconds", "single-core"),
        ("calibration_parallel_seconds", "all-core"),
    ):
        po, pn = old.get(key), new.get(key)
        if po and pn:
            norms[label] = (raw * po / pn, pn / po)
            print(f"probe {label:11s}: {po:.3f}s -> {pn:.3f}s "
                  f"(box {pn / po:.3f}x); code-reads {raw * po / pn:.3f}s")
        else:
            print(f"probe {label:11s}: missing on one side — no normalization")
    print(f"raw total          : {old.get('value')}s -> {raw}s")
    if len(norms) == 2:
        vals = [v[0] for v in norms.values()]
        spread = abs(vals[0] - vals[1]) / min(vals) if min(vals) else 0.0
        if spread > PROBE_DISAGREE:
            print(f"PROBES DISAGREE ({spread * 100:.1f}% > "
                  f"{PROBE_DISAGREE * 100:.0f}%): neither raw total is a "
                  f"code claim — adjudicate only per-query movers >= "
                  f"{THRESHOLD}x below")
        else:
            lo, hi = sorted(vals)
            print(f"probes agree ({spread * 100:.1f}% <= "
                  f"{PROBE_DISAGREE * 100:.0f}%): normalized total is a code "
                  f"claim, bracket [{lo:.3f}s, {hi:.3f}s]")
    print()


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    old, new = load(sys.argv[1]), load(sys.argv[2])
    print_probe_lead(old, new)
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
