"""Fact verdicts, entity cards, DIRT relation similarity."""

import pyarrow as pa

import ray.data

from aida_ray.stages.kb_slots import entity_cards
from aida_ray.stages.kgqa import fact_verdicts
from aida_ray.stages.rules import relation_jaccard


def _triples(rows):
    s, p, o = zip(*rows) if rows else ([], [], [])
    return ray.data.from_arrow(pa.table({
        "subj": pa.array(list(s), pa.string()),
        "pred": pa.array(list(p), pa.string()),
        "obj": pa.array(list(o), pa.string())}))


def test_fact_verdicts(ray_session):
    kb = pa.table({
        "subj": pa.array(["e1", "e2"], pa.string()),
        "pred": pa.array(["bornIn", "bornIn"], pa.string()),
        "obj": pa.array(["c1", "c2"], pa.string())})
    ext = _triples([("e1", "bornIn", "c1"),    # exact match
                    ("e2", "bornIn", "c9"),    # functional conflict
                    ("e3", "bornIn", "c1"),    # unknown subject
                    ("e1", "livesIn", "c1")])  # unknown predicate
    out = fact_verdicts(ext, kb, ["bornIn"]).to_pandas()
    assert list(out["verdict"]) == ["supported", "contradicted",
                                    "novel", "novel"]


def test_fact_verdicts_nonfunctional_not_contradicted(ray_session):
    kb = pa.table({
        "subj": pa.array(["e1"], pa.string()),
        "pred": pa.array(["linksTo"], pa.string()),
        "obj": pa.array(["e2"], pa.string())})
    ext = _triples([("e1", "linksTo", "e3")])
    out = fact_verdicts(ext, kb, ["bornIn"]).to_pandas()
    assert list(out["verdict"]) == ["novel"]


def test_entity_cards_topk_and_rank(ray_session):
    t = _triples([("e1", "p", "a"), ("e1", "p", "a"),
                  ("e1", "q", "b"), ("e1", "r", "c"),
                  ("e2", "p", "z")])
    out = entity_cards(t, top_k=2).to_pandas()
    e1 = out[out["subj"] == "e1"].sort_values("rank")
    assert list(e1["obj"]) == ["a", "b"]      # votes 2, then tie p<q? q
    assert list(e1["votes"]) == [2, 1]
    assert list(e1["rank"]) == [1, 2]
    assert len(out[out["subj"] == "e2"]) == 1


def test_relation_jaccard(ray_session):
    t = _triples([("c1", "cityOf", "n1"), ("c2", "cityOf", "n2"),
                  ("c3", "cityOf", "n3"),
                  ("c1", "locatedIn", "n1"), ("c2", "locatedIn", "n2"),
                  ("c9", "locatedIn", "n9")])
    out = relation_jaccard(t).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["pred_a"], r["pred_b"]) == ("cityOf", "locatedIn")
    assert (r["inter"], r["size_a"], r["size_b"]) == (2, 3, 3)
    assert r["jaccard"] == 0.5
    assert relation_jaccard(t, min_jaccard=0.6).num_rows == 0
