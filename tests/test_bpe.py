"""Tests for distributed BPE training/encoding."""

import pyarrow as pa

import ray.data as rd


def test_learn_bpe_classic_example(ray_session):
    from aida_ray.stages.bpe import learn_bpe
    # Sennrich-style toy corpus: 'low' x5, 'lowest' x2, 'newer' x6,
    # 'wider' x3 — spread over several docs/blocks
    docs = (["low"] * 5 + ["lowest"] * 2 + ["newer"] * 6 + ["wider"] * 3)
    ds = rd.from_arrow(pa.table({
        "doc_id": list(range(len(docs))), "text": docs})).repartition(4)
    merges = learn_bpe(ds, "text", num_merges=4, min_count=1)
    # 'er</w>' from newer+wider (9) is the top pair: ('e','r') then
    # ('er','</w>')
    assert merges[0] == ("e", "r")
    assert merges[1] == ("er", "</w>")
    assert len(merges) == 4


def test_bpe_encoding_blocking_invariant_and_lossless(ray_session):
    from aida_ray.stages.bpe import BpeEncoder, bpe_token_counts, learn_bpe
    texts = ["the quick brown fox jumps over the lazy dog",
             "the quicker browner foxes jump over lazier dogs",
             "pack my box with five dozen liquor jugs"] * 7
    ds = rd.from_arrow(pa.table({
        "doc_id": list(range(len(texts))), "text": texts}))
    merges = learn_bpe(ds, "text", num_merges=30, min_count=1)
    a = bpe_token_counts(ds.repartition(2), merges, concurrency=2) \
        .to_pandas().sort_values("doc_id").n_bpe_tokens.tolist()
    b = bpe_token_counts(ds.repartition(7), merges, concurrency=2) \
        .to_pandas().sort_values("doc_id").n_bpe_tokens.tolist()
    assert a == b
    # tokens reassemble the original words (lossless segmentation)
    enc = BpeEncoder(merges)
    for w in ["quick", "jumps", "liquor"]:
        toks = enc._encode_word(w)
        assert "".join(toks).replace("</w>", "") == w
