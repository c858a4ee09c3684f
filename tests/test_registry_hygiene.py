"""Registry/driver-contract hygiene (verify skill, r3/r4 lessons): the
driver hash-checks only the first 50 exported queries, so window structure
is load-bearing — and every registered query must carry an oracle (zero
rows-only since r4)."""

from __future__ import annotations

from kinesis_stream_video_project_spark.plans import registry


def test_driver_window_is_exactly_the_export_prefix():
    qs = registry.all_queries()
    win = registry.DRIVER_PRIORITY
    assert len(win) == 50, "driver verifies a prefix of exactly 50"
    assert len(set(win)) == 50, "duplicate names waste verification budget"
    missing = [n for n in win if n not in qs]
    assert not missing, f"window names not in registry: {missing}"
    assert list(qs)[:50] == list(win), "export order must start with the window"


def test_window_matches_priority_builder():
    """The standing staleness SLO (VERDICT r9 item 9): the committed
    DRIVER_PRIORITY must equal what the builder derives from the
    CORRECTNESS artifacts — new registrations first, then refreshes
    oldest-latest-green first — so a query can never silently age past
    what the refresh budget allows; the window is re-derived by code,
    not by hand, every round.

    The derivation is pinned to artifacts r1..r{BUILT_FROM} (ADVICE r10
    item 4): the driver lands CORRECTNESS_r{BUILT_FROM+1}.json at the
    round boundary before the next rotation commit, and without the pin
    that artifact flipped this test red at every judged head by design.
    The companion assertion below caps the pin's lag at ONE round —
    that cap is what still forces the per-round rotation."""
    import pathlib

    root = str(pathlib.Path(__file__).resolve().parent.parent)
    built = registry.build_driver_priority(
        root, max_round=registry.DRIVER_PRIORITY_BUILT_FROM
    )
    if built is None:
        import pytest

        pytest.skip("no CORRECTNESS_r*.json artifacts (fresh clone)")
    assert built == registry.DRIVER_PRIORITY


def test_priority_pin_lags_artifacts_by_at_most_one_round():
    """The rotation forcing-function: if two correctness artifacts land
    without a DRIVER_PRIORITY rotation, the window is serving stale
    verification priorities — the five-place rotation commit is
    overdue (registry.py DRIVER_PRIORITY comment)."""
    import glob
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parent.parent
    rounds = [
        int(re.search(r"r(\d+)", pathlib.Path(p).name).group(1))
        for p in glob.glob(str(root / "CORRECTNESS_r*.json"))
    ]
    if not rounds:
        import pytest

        pytest.skip("no CORRECTNESS_r*.json artifacts (fresh clone)")
    assert max(rounds) <= registry.DRIVER_PRIORITY_BUILT_FROM + 1, (
        f"newest artifact is r{max(rounds)} but DRIVER_PRIORITY was built "
        f"from r{registry.DRIVER_PRIORITY_BUILT_FROM} — rotate the window"
    )


def test_every_query_is_oracle_paired():
    qs = registry.all_queries()
    rows_only = [n for n, s in qs.items() if not s.oracle]
    assert not rows_only, (
        f"rows-only queries reappeared: {rows_only} — since r4 every "
        "registered query must ship a DuckDB oracle (portable hashes / "
        "deterministic tiers / recursive-CTE folds; see queries_llm.py)"
    )


def test_entry_contract_exports_registry():
    import __spark_entry__ as E

    qs = registry.all_queries()
    assert set(E.queries().keys()) == set(qs.keys())
    oracles = E.oracle_sql()
    assert set(oracles.keys()) == set(qs.keys())
    assert all(isinstance(v, str) and v.strip() for v in oracles.values())


def test_temp_view_queries_survive_sf_switch(spark):
    """Queries that register temp views (io.register_views + spark.sql) must
    stay correct when one session switches sf_dirs between calls — views
    are re-registered per call, and a stale registration would silently
    serve the previous scale factor's data (verify-skill gotcha)."""
    import duckdb

    from kinesis_stream_video_project_spark.plans import registry as reg

    spec = next(
        s
        for s in reg.all_queries().values()
        if "register_views" in __import__("inspect").getsource(s.fn)
    )
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = spec.fn(spark, sf_dir).count()
        con = duckdb.connect()
        for t in ("region","nation","customer","supplier","part","orders",
                  "lineitem","events","documents","embeddings"):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        want = len(con.sql(spec.oracle).df())
        assert got == want, f"{spec.name}@{sf_dir}: {got} vs {want} (stale views?)"
