"""Verification-window policy as an ENFORCED invariant (round-4 verdict
task 7).

The driver oracles only the FIRST 50 entries of ``__spark_entry__.
queries()`` each round, so dict order IS the coverage policy. Round 3
shipped 13 registered queries with no green CORRECTNESS row because the
registry tail was never rotated forward. These tests turn the
least-recently-verified-first rule into pytest failures instead of judge
archaeology:

1. every registry query WITHOUT a green row in the latest round must sit
   inside the next round's verification window (``queries()[:50]``);
2. no query that has ever been verified may go two consecutive rounds
   without a row (stale evidence must rotate forward before it ages).

A row counts as green when the value hash matches, or — for the
documented approximate queries — when the driver recorded its rows-only
check without error.
"""

from __future__ import annotations

import json
import pathlib
import re

REPO = pathlib.Path(__file__).resolve().parents[1]
WINDOW = 50  # driver verifies queries()[:50] (observed r01-r03)


def _correctness_rounds() -> list[tuple[int, dict]]:
    out = []
    for path in REPO.glob("CORRECTNESS_r*.json"):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", path.name)
        if not m:
            continue
        try:
            data = json.loads(path.read_text())
        except ValueError:
            continue
        if isinstance(data, dict) and data:
            out.append((int(m.group(1)), data))
    return sorted(out)


def _is_green(row: dict) -> bool:
    if not isinstance(row, dict):
        return False
    if row.get("hash_match") is True:
        return True
    # rows-only path for approximate queries: driver ran it, no error
    # beyond the deliberate missing oracle, and rows were produced
    return row.get("err") == "no_oracle" and (row.get("spark_rows") or 0) > 0


def _registry() -> list[str]:
    import sys

    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entry

    return list(entry.queries())


def test_unverified_queries_sit_inside_next_window():
    rounds = _correctness_rounds()
    assert rounds, "no CORRECTNESS artifacts found"
    latest = rounds[-1][1]
    green = {q for q, row in latest.items() if _is_green(row)}
    names = _registry()
    window = set(names[:WINDOW])
    stale = [q for q in names if q not in green]
    out_of_window = [q for q in stale if q not in window]
    assert not out_of_window, (
        f"{len(out_of_window)} queries lack a green row in round "
        f"{rounds[-1][0]} AND sit outside queries()[:{WINDOW}] — reorder "
        f"the registry least-recently-verified-first: {out_of_window}"
    )


def test_aging_queries_lead_the_registry():
    """A query missing from BOTH of the last two CORRECTNESS rounds has
    aged past the policy bar; it must occupy the FRONT half of the next
    verification window so the coming round necessarily re-oracles it
    (merely sitting at position 49 would let one added query push it out
    again)."""
    rounds = _correctness_rounds()
    if len(rounds) < 2:
        return
    latest, prev = rounds[-1][1], rounds[-2][1]
    ever = set().union(*(set(d) for _n, d in rounds))
    names = _registry()
    front = set(names[: WINDOW // 2])
    aging = [
        q
        for q in names
        if q in ever and q not in latest and q not in prev
    ]
    misplaced = [q for q in aging if q not in front]
    assert not misplaced, (
        f"queries missing from CORRECTNESS rounds {rounds[-2][0]} and "
        f"{rounds[-1][0]} must sit inside queries()[:{WINDOW // 2}]: "
        f"{misplaced}"
    )
