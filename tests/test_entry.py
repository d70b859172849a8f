"""Driver-contract smoke tests for __ray_entry__ (sf0.001)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(not os.path.isdir(SF), reason="no driver testdata")


def test_entry_and_contract(ray_session):
    import __ray_entry__ as E
    qs = E.queries()
    oracles = E.oracle_sql()
    assert set(oracles) <= set(qs)
    # every query is callable; spot-run the cheap SQL-checked ones
    for name in ["pages", "dict_lookup", "token_stats", "lang_dist",
                 "golden_fixture"]:
        t = qs[name](SF)
        assert t.num_rows >= 0
    g = qs["golden_fixture"](SF).to_pydict()
    assert dict(zip(g["mention"], g["entity"])) == {
        "Page": "Jimmy_Page", "Kashmir": "Kashmir_(song)",
        "Knebworth": "Knebworth_Festival", "Les Paul": "--OOKBE--"}


def test_entry_flagship(ray_session):
    import __ray_entry__ as E
    t = E.entry()
    t = t.to_pandas() if hasattr(t, "to_pandas") else t
    assert len(t) > 0
    assert {"subj", "pred", "obj", "support"} <= set(t.columns)


def test_kg_incremental_equals_one_shot(ray_session):
    """Incremental store merge (old batch + new batch) must be
    bit-equal to the one-shot full-corpus run — support summation is
    associative, so batch boundaries cannot change the KG."""
    import pandas as pd

    import __ray_entry__ as E
    qs = E.queries()
    full = qs["kg_triples"](SF).to_pandas()
    inc = qs["kg_incremental"](SF).to_pandas()
    pd.testing.assert_frame_equal(inc, full)


def test_query_names_unique():
    """Judge r4 item 2: the queries()/oracle_sql() dict literals must
    carry no duplicate string keys (Python silently keeps the last one,
    masking a dropped query), and the declared count is pinned."""
    sys.path.insert(0, "/root/repo/tools")
    from selfcheck import duplicate_literal_keys
    assert duplicate_literal_keys("queries") == []
    assert duplicate_literal_keys("oracle_sql") == []
    import __ray_entry__ as E
    assert len(E.queries()) == 355


def test_duplicate_key_detector_catches_a_dup(tmp_path, monkeypatch):
    """Negative control: re-introduce a duplicate key in a scratch copy
    of the entry module and assert the AST detector flags it (the exact
    r4 bug: "mixture_sample" listed twice, second silently winning)."""
    sys.path.insert(0, "/root/repo/tools")
    import selfcheck as sc
    src = open("/root/repo/__ray_entry__.py").read()
    bad = src.replace(
        '"kg_triples":',
        '"mixture_sample": q_mixture_sample,\n        "kg_triples":', 1)
    assert bad != src
    fake_repo = tmp_path / "repo"
    (fake_repo / "tools").mkdir(parents=True)
    (fake_repo / "__ray_entry__.py").write_text(bad)
    # the detector locates the entry module relative to its own file
    monkeypatch.setattr(sc, "__file__", str(fake_repo / "tools" / "selfcheck.py"))
    assert "mixture_sample" in sc.duplicate_literal_keys("queries")
    # and the clean tree stays clean
    monkeypatch.undo()
    assert sc.duplicate_literal_keys("queries") == []
