"""Unit tests: evidence_sentences, kb_diff, canonical_url_pick."""

import pyarrow as pa


def _ds(tbl):
    import ray.data
    return ray.data.from_arrow(tbl)


def test_evidence_sentences_both_required(ray_session):
    from aida_ray.stages.kb_slots import evidence_sentences
    docs = _ds(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": ["AdaX met BobY here.\nonly AdaX here.\n"
                 "BobY met AdaX again."]}))
    targets = _ds(pa.table({"subj": ["AdaX"], "pred": ["met"],
                            "obj": ["BobY"]}))
    got = evidence_sentences(docs, targets).to_pandas()
    assert sorted(got["sent_idx"]) == [1, 3]   # line 2 lacks the obj


def test_kb_diff_changes(ray_session):
    from aida_ray.stages.kb_slots import kb_diff
    old = _ds(pa.table({"subj": ["a", "b", "b"], "pred": ["p"] * 3,
                        "obj": ["1", "2", "2"]}))   # dup collapses
    new = _ds(pa.table({"subj": ["a", "c"], "pred": ["p"] * 2,
                        "obj": ["1", "3"]}))
    got = kb_diff(old, new).to_pandas()
    ch = got.set_index(["subj", "obj"])["change"]
    assert ch[("b", "2")] == "removed"
    assert ch[("c", "3")] == "added"
    assert len(got) == 2                        # unchanged (a,1) absent


def test_canonical_url_preference(ray_session):
    from aida_ray.stages.urls import canonical_url_pick
    t = _ds(pa.table({
        "cluster": ["c1"] * 3 + ["c2"] * 2,
        "url": ["http://x/a",            # http loses to https
                "https://x/a-long-url",  # https, longer
                "https://x/a",           # https, shortest -> winner
                "http://y/bb", "http://y/aa"]}))  # same len: lex
    got = canonical_url_pick(t).to_pandas().set_index("cluster")
    assert got.loc["c1", "canonical_url"] == "https://x/a"
    assert got.loc["c2", "canonical_url"] == "http://y/aa"
