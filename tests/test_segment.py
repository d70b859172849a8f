"""Unit tests: text_tiles (TextTiling-lite) and readability_scores."""

import numpy as np
import pyarrow as pa


def _ds(tbl):
    import ray.data
    return ray.data.from_arrow(tbl)


def test_text_tiles_topic_shift(ray_session):
    from aida_ray.stages.segment import text_tiles
    # block 0 repeats 'cat', block 1 repeats 'dog' (disjoint ->
    # boundary), block 2 = block 1 vocab (identical -> no boundary)
    txt = " ".join(["cat"] * 10 + ["dog"] * 10 + ["dog"] * 10)
    got = text_tiles(_ds(pa.table({"doc_id": [1], "text": [txt]})),
                     w=10).to_pandas().sort_values("gap_idx")
    assert got["gap_idx"].tolist() == [0, 1]
    assert got.iloc[0]["inter"] == 0 and bool(got.iloc[0]["is_boundary"])
    assert got.iloc[1]["sim"] == 1.0 and not bool(
        got.iloc[1]["is_boundary"])


def test_text_tiles_partial_block_and_jaccard(ray_session):
    from aida_ray.stages.segment import text_tiles
    # 10 distinct + 3-token tail sharing one term
    txt = " ".join(f"w{i}" for i in range(10)) + " w0 a b"
    got = text_tiles(_ds(pa.table({"doc_id": [7], "text": [txt]})),
                     w=10).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert r["inter"] == 1 and r["union_size"] == 12
    assert abs(r["sim"] - round(1 / 12, 6)) < 1e-9
    assert bool(r["is_boundary"])            # 10*1 < 12


def test_text_tiles_short_doc_no_gaps(ray_session):
    from aida_ray.stages.segment import text_tiles
    got = text_tiles(_ds(pa.table({"doc_id": [1, 2],
                                   "text": ["just five words here now",
                                            ""]})), w=10).to_pandas()
    assert len(got) == 0


def test_readability_counts(ray_session):
    from aida_ray.stages.segment import readability_scores
    t = _ds(pa.table({
        "doc_id": [0, 1, 2],
        "text": ["The cat sat. The dog ran! Happy end.",
                 "...?!",
                 "rhythm"]}))          # 'rhythm': one 'y' group
    got = readability_scores(t).to_pandas().set_index("doc_id")
    assert got.loc[0, "n_sents"] == 3
    assert got.loc[0, "n_words"] == 8
    # the(1) cat(1) sat(1) the(1) dog(1) ran(1) happy(2) end(1) = 9
    assert got.loc[0, "n_syllables"] == 9
    want = round(206.835 - 1.015 * (8 / 3) - 84.6 * (9 / 8), 6)
    assert abs(got.loc[0, "flesch"] - want) < 1e-9
    # punctuation-only: no words, sentence floor 1, flesch 0
    assert got.loc[1, "n_words"] == 0
    assert got.loc[1, "n_sents"] == 1
    assert got.loc[1, "flesch"] == 0.0
    assert got.loc[2, "n_syllables"] == 1
