"""Pins the attestation-window rotation contract (no Spark needed).

The window ordering in ``__spark_entry__.queries()`` is hand-curated
each round; ``tools/rotation_check.py`` recomputes the staleness facts
from the CORRECTNESS artifacts and this wrapper makes any mis-queue a
test failure instead of a wasted driver round.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import __spark_entry__ as entry
from rotation_check import WINDOW, check, last_green


def test_window_holds_least_recently_attested():
    problems = check(list(entry.queries()), set(entry.oracle_sql()))
    assert not problems, "\n".join(problems)


def test_window_is_exactly_full():
    """Fewer than 50 attestable entries up front would waste driver
    slots; the driver never reads past 50. A window slot is well spent
    on a paired entry (full hash compare) or -- the rule-3 exception --
    on a rows-only entry that has NEVER produced a driver row (its
    one-time ``spark_rows > 0`` check; r10 judge item #4)."""
    from rotation_check import last_attested

    window = list(entry.queries())[:WINDOW]
    paired = set(entry.oracle_sql())
    green, red = last_attested()
    assert len(window) == WINDOW
    for q in window:
        assert q in paired or (q not in green and q not in red), (
            f"{q}: rows-only entry with prior driver evidence in the window"
        )


def test_artifacts_are_readable_and_nonempty():
    green = last_green()
    assert len(green) >= 50  # at least one full driver round recorded


def test_red_pinned_entry_is_exempt_from_staleness_inversion(tmp_path):
    """An entry whose LAST driver verdict was red is correctly pinned
    at the window front even if its last GREEN round is fresher than
    an outside entry's (the lm_score precedent)."""
    import json

    from tools.rotation_check import check

    def art(rnd, rows):
        (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(
            json.dumps(
                {
                    q: {
                        "rows_match": True,
                        "schema_match": True,
                        "hash_match": ok,
                    }
                    for q, ok in rows.items()
                }
            )
        )

    # x: green in r06, red in r07 (front-pinned for r08);
    # y: green only in r05, sits OUTSIDE the window.
    art(5, {"y": True})
    art(6, {"x": True})
    art(7, {"x": False})
    queries = ["x"] + [f"f{i}" for i in range(49)] + ["y"]
    paired = set(queries)
    problems = check(queries, paired, repo=str(tmp_path))
    assert not [p for p in problems if p.startswith("x:")], problems
