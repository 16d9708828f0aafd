"""Generated docs must match the code they index -- a stale committed
QUERIES.md once claimed 146 entries while the surface had 152 (the
generator printed to stdout and two runs piped it to /dev/null)."""

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_queries_md_matches_regeneration():
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import gen_queries_md

    with open(os.path.join(REPO, "QUERIES.md")) as f:
        committed = f.read()
    assert committed == gen_queries_md.render(), (
        "QUERIES.md is stale -- run: python tools/gen_queries_md.py"
    )


def test_readme_counts_match_surface():
    import __spark_entry__ as entry

    n = len(entry.queries())
    paired = len(entry.oracle_sql())
    with open(os.path.join(REPO, "README.md")) as f:
        readme = f.read()
    assert f"{n} `queries()` entries ({paired} DuckDB-oracle-paired" in readme, (
        f"README.md counts drifted from the actual surface ({n}/{paired})"
    )


def test_readme_portable_count_matches_frontend():
    """The README's headline 3-way-portable count once drifted three
    ways (215 claimed / 211 actual / 203 in the changelog) because no
    guard covered it -- pin it to the PORTABLE list itself."""
    from tests.test_sql_frontend import PORTABLE

    n = len(PORTABLE)
    assert n == len(set(PORTABLE)), "PORTABLE has duplicate names"
    with open(os.path.join(REPO, "README.md")) as f:
        readme = f.read()
    assert f"oracle statements -- {n} queries" in readme, (
        f"README.md portable count drifted from len(PORTABLE)={n}"
    )


def test_bench_load_guard_annotates_not_refuses():
    """The solo-run guard (r11 verdict item #2) must annotate a busy
    pre-run host in the artifact and stay silent on an idle one --
    and never raise, because an empty driver artifact is worse than
    an annotated one."""
    import sys

    sys.path.insert(0, REPO)
    from bench import load_warning_for

    assert load_warning_for(0.5) is None
    assert load_warning_for(1.99) is None
    w = load_warning_for(17.57)
    assert w is not None and "17.57" in w and "re-run solo" in w
