"""The driver-window rotation contract, self-checking (r7).

The external correctness driver verifies only the first 50 registered
entries per round (registry.py's window comment). The rotation rule —
"no oracle-bearing entry's most-recent driver row may end a round more
than 2 rounds old" — was previously re-derived by hand each round from
the CORRECTNESS_r*.json history; these tests derive it from the
committed artifacts so a mis-planned window fails CI before the
driver ever runs."""

from __future__ import annotations

import glob
import json
import os
import re

import data_lake_construction_and_querying_with_pyspark_spark.registry as reg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW_SLOTS = 50
MAX_AGE = 2  # rounds an oracle entry may go without a fresh driver row


def _ledger() -> tuple[dict[str, int], int]:
    """name -> latest round with a driver row, and the newest round."""
    latest: dict[str, int] = {}
    newest = 0
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        assert m, path
        r = int(m.group(1))
        newest = max(newest, r)
        for name in json.load(open(path)):
            latest[name] = max(latest.get(name, 0), r)
    return latest, newest


def test_window_is_50_distinct_registered_oracle_entries():
    qs = reg.all_queries()
    window = reg._CHECKED_WINDOW_FIRST
    assert len(window) == WINDOW_SLOTS
    assert len(set(window)) == WINDOW_SLOTS, "duplicate window entries"
    missing = [n for n in window if n not in reg.QUERIES]
    assert not missing, missing
    rows_only = [n for n in window if reg.QUERIES[n].oracle is None]
    assert not rows_only, f"rows-only entries burn window slots: {rows_only}"
    # registration order is the driver contract: the window IS the
    # first 50 of all_queries()
    assert tuple(list(qs)[:WINDOW_SLOTS]) == window


def _window_consumed(latest: dict[str, int], newest: int, window) -> bool:
    """True when the driver has ALREADY run the committed window: every
    window entry's latest ledger row is the newest artifact round. The
    driver lands CORRECTNESS_r{N}.json AFTER the builder's final commit
    (VERDICT r10 What's-wrong #1), so the judged snapshot is always in
    this state — modeling it as "the window runs next round" re-runs a
    consumed window and fails by construction (the r8/r9/r10 round-edge
    reds). First-commit rotation cannot fix that; detection can."""
    return all(latest.get(n) == newest for n in window)


def _forced_for(round_no: int, latest: dict[str, int]) -> list[str]:
    """Oracle-bearing entries that MUST occupy ``round_no``'s window:
    anything whose latest driver row would otherwise end that round
    more than MAX_AGE old, plus never-driver-checked entries (latest 0
    — new registrations enter the window on first exposure)."""
    return sorted(
        name
        for name, spec in reg.QUERIES.items()
        if spec.oracle is not None and round_no - latest.get(name, 0) > MAX_AGE
    )


def test_window_keeps_every_oracle_entry_fresh():
    """Assuming the current window runs this round (round newest+1),
    no live oracle-bearing entry's latest driver row may end the round
    more than MAX_AGE rounds old — the contract the judge recomputes
    (VERDICT r6: '50 @r6, 49 @r5, 32 @r4, nothing older').

    Consumed-window state (driver artifacts landed after the final
    commit): the window has RUN; asserting freshness of a hypothetical
    re-run is meaningless. The invariant that must hold instead is
    that next round's forced must-set fits the slots — i.e. a rotation
    satisfying the contract EXISTS for round newest+1."""
    reg.all_queries()
    latest, newest = _ledger()
    if newest == 0:
        return  # no driver artifacts yet (fresh clone)
    window = set(reg._CHECKED_WINDOW_FIRST)
    if _window_consumed(latest, newest, window):
        forced = _forced_for(newest + 1, latest)
        assert len(forced) <= WINDOW_SLOTS, (
            f"round {newest + 1} needs {len(forced)} forced slots "
            f"(> {WINDOW_SLOTS}): {forced}"
        )
        return
    this_round = newest + 1
    stale = []
    for name, spec in reg.QUERIES.items():
        if spec.oracle is None or name in window:
            continue
        last = latest.get(name)
        if last is None:
            stale.append((name, "never driver-checked and not in window"))
        elif this_round - last > MAX_AGE:
            stale.append((name, f"latest driver row r{last} would be {this_round - last} rounds old"))
    assert not stale, stale


def test_next_round_window_plan_is_feasible():
    """VERDICT r8 directive #6: assert the cycle stays solvable one
    round AHEAD, not just this round.  After the current window runs at
    round newest+1 (every in-window entry's latest row becomes
    newest+1), the entries that MUST occupy round newest+2's window are
    those whose latest row would otherwise end that round more than
    MAX_AGE old.  If that must-set exceeds WINDOW_SLOTS the rotation is
    already over-committed and no r+1 plan can satisfy the contract —
    catch it now, a full round early."""
    reg.all_queries()
    latest, newest = _ledger()
    if newest == 0:
        return  # no driver artifacts yet (fresh clone)
    window = set(reg._CHECKED_WINDOW_FIRST)
    this_round = newest + 1
    next_round = newest + 2
    if _window_consumed(latest, newest, window):
        # The committed window already ran at round ``newest``;
        # project the FORCED ROTATION for round newest+1 (forced
        # must-set + stalest-first fill to WINDOW_SLOTS — the rotation
        # any builder following the contract would commit) instead of
        # a re-run of the consumed window, which nobody will run and
        # which previously projected alarming-but-hypothetical slot
        # counts (VERDICT r10: "87 forced slots for r12").
        forced = _forced_for(this_round, latest)
        fill = sorted(
            (
                name
                for name, spec in reg.QUERIES.items()
                if spec.oracle is not None and name not in set(forced)
            ),
            key=lambda n: (latest.get(n, 0), n),
        )[: max(0, WINDOW_SLOTS - len(forced))]
        window = set(forced) | set(fill)
    projected = {
        name: (this_round if name in window else latest.get(name, 0))
        for name, spec in reg.QUERIES.items()
        if spec.oracle is not None
    }
    must_next = sorted(
        name for name, last in projected.items() if next_round - last > MAX_AGE
    )
    assert len(must_next) <= WINDOW_SLOTS, (
        f"round {next_round} would need {len(must_next)} forced slots "
        f"(> {WINDOW_SLOTS}): {must_next}"
    )
