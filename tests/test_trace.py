"""GraphTracer-analogue decision traces (reference
src/mpi/experiment/trace/): score components per (mention, candidate),
computed by the production kernels."""

from aida_ray.kb.fixture import build_fixture_kb
from aida_ray.ned.settings import DisambiguationSettings
from aida_ray.ned.trace import trace_decisions


def test_prior_trace_pins_fixture_priors():
    t = trace_decisions(
        "t://0", "Page played with Kashmir at Knebworth .",
        build_fixture_kb(),
        DisambiguationSettings(technique="prior")).to_pandas()
    rows = {(r.mention, r.candidate): r for r in t.itertuples()}
    assert rows[("Page", "Larry_Page")].prior == 0.7
    assert rows[("Page", "Larry_Page")].chosen
    assert not rows[("Page", "Jimmy_Page")].chosen
    assert rows[("Kashmir", "Kashmir")].chosen
    assert rows[("Knebworth", "Knebworth_Festival")].prior == 1.0
    # exactly one chosen row per mention
    assert t.groupby("mention")["chosen"].sum().eq(1).all()


def test_trace_matches_graph_decision_and_carries_sim():
    """Under the graph technique the trace's chosen flags must agree
    with disambiguate_document, and local_sim must be populated for
    candidates with keyphrase evidence."""
    from aida_ray.ned.disambiguator import disambiguate_document
    kb = build_fixture_kb()
    text = "Jimmy Page played Kashmir at Knebworth ."
    settings = DisambiguationSettings()
    t = trace_decisions("t://1", text, kb, settings).to_pandas()
    want = {(r.mention, r.entity)
            for r in disambiguate_document("t://1", text, kb, settings)}
    got = {(r.mention, r.candidate) for r in t.itertuples() if r.chosen}
    assert got == want
    assert (t["local_sim"] > 0).any()


def test_trace_emits_ookbe_row_for_uncovered_mention():
    kb = build_fixture_kb()
    t = trace_decisions(
        "t://2", "[[Zyxqwv]] met Kashmir .", kb,
        DisambiguationSettings(technique="prior")).to_pandas()
    sub = t[t["mention"] == "Zyxqwv"]
    assert len(sub) == 1
    assert sub.iloc[0]["candidate"] == "--OOKBE--"
    assert bool(sub.iloc[0]["chosen"])
