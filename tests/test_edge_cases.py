"""Edge-case hardening: empty/unicode/pathological documents, graph-size
cap fallback, canonicalization under extreme key skew."""

import pyarrow as pa
import pytest

from aida_ray.kb.kb import OOKBE
from aida_ray.ned.disambiguator import disambiguate_document
from aida_ray.ned.settings import cocktail_party_settings, local_settings


def test_empty_and_whitespace_docs(fixture_kb):
    assert disambiguate_document("d", "", fixture_kb) == []
    assert disambiguate_document("d", "   \n\t  ", fixture_kb) == []


def test_unicode_text(fixture_kb):
    text = "Ünïcòdé — text with Page … and emoji 🎸 plus Kashmir."
    res = {r.mention: r for r in disambiguate_document("d", text, fixture_kb)}
    assert "Page" in res
    assert "Kashmir" in res
    for r in res.values():
        assert text[r.char_offset:r.char_offset + r.char_length] == r.mention


def test_mention_only_no_context(fixture_kb):
    # no keyphrase evidence at all: prior must decide (switch fires for
    # high-prior mentions; Knebworth prior 1.0 > 0.9)
    res = {r.mention: r for r in
           disambiguate_document("d", "Knebworth", fixture_kb)}
    assert res["Knebworth"].entity == "Knebworth_Festival"


def test_repeated_hot_mention(fixture_kb):
    # 50 repetitions of an ambiguous mention — graph stays bounded and
    # all occurrences resolve consistently
    text = " ".join(["When Page played Kashmir."] * 50)
    res = disambiguate_document("d", text, fixture_kb,
                                cocktail_party_settings())
    pages = [r for r in res if r.mention == "Page"]
    assert len(pages) == 50
    assert len({r.entity for r in pages}) == 1


def test_graph_size_cap_falls_back_to_local(fixture_kb):
    s = cocktail_party_settings(max_candidates_for_graph=1)
    text = "When [[Page]] played Kashmir at Knebworth, his Les Paul was uniquely tuned."
    res = {r.mention: r for r in disambiguate_document("d", text, fixture_kb, s)}
    # degraded to LOCAL, decisions still sane
    assert res["Page"].entity == "Jimmy_Page"
    assert res["Les Paul"].entity == OOKBE


def test_markup_only_document(fixture_kb):
    res = disambiguate_document("d", "[[Page]]", fixture_kb, local_settings())
    assert [r.mention for r in res] == ["Page"]


def test_canonicalization_under_skew(ray_session):
    """One head entity holds 90% of mentions — salted two-phase agg must
    still produce exact counts."""
    import ray

    from aida_ray.pipelines.kg import canonicalize_entities
    n = 20000
    subj = ["HeadEntity"] * (n * 9 // 10) + \
           [f"tail_{i % 50}" for i in range(n // 10)]
    t = pa.table({
        "subj": pa.array(subj, pa.string()),
        "pred": pa.array(["mentionedIn"] * n, pa.string()),
        "obj": pa.array([f"http://u/{i % 3000}" for i in range(n)], pa.string()),
        "url": pa.array([f"http://u/{i % 3000}" for i in range(n)], pa.string()),
        "warc_ts": pa.array([0] * n, pa.timestamp("ms")),
        "score": pa.array([1.0] * n, pa.float64()),
    })
    ds = ray.data.from_arrow(t).repartition(8)
    out = canonicalize_entities(ds, n_salts=8).to_pandas()
    head = out[out["entity"] == "HeadEntity"].iloc[0]
    assert head["mention_count"] == n * 9 // 10
    assert out["mention_count"].sum() == n
    assert len(out) == 51


def test_triple_dedup_exactness(ray_session):
    import ray

    from aida_ray.pipelines.kg import dedup_triples
    rows = []
    for i in range(1000):
        rows.append(("e1", "coOccursWith", f"e{i % 7}"))
    t = pa.table({
        "subj": pa.array([r[0] for r in rows]),
        "pred": pa.array([r[1] for r in rows]),
        "obj": pa.array([r[2] for r in rows]),
        "url": pa.array(["u"] * len(rows)),
        "warc_ts": pa.array([0] * len(rows), pa.timestamp("ms")),
        "score": pa.array([1.0] * len(rows)),
    })
    out = dedup_triples(ray.data.from_arrow(t).repartition(5)).to_pandas()
    assert len(out) == 7
    assert out["support"].sum() == 1000
