"""Exact-substring dedup coverage: brute-force parity + blocking
invariance + the vectorized interval-union kernel."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from aida_ray.stages.substring import _coverage_batch, dup_span_coverage


def brute_coverage(texts: dict[int, str], k: int, min_count: int = 2):
    from collections import Counter
    grams: Counter = Counter()
    toks = {d: t.split(" ") for d, t in texts.items()}
    for d, ts in toks.items():
        for i in range(len(ts) - k + 1):
            grams[tuple(ts[i:i + k])] += 1
    out = {}
    for d, ts in toks.items():
        covered = set()
        for i in range(len(ts) - k + 1):
            if grams[tuple(ts[i:i + k])] >= min_count:
                covered.update(range(i, i + k))
        out[d] = (len(ts), len(covered))
    return out


def test_coverage_batch_kernel():
    # overlapping, touching, disjoint, duplicate starts; two docs
    d = np.array([1, 1, 1, 1, 2, 2], dtype="int64")
    p = np.array([0, 2, 10, 10, 5, 6], dtype="int64")
    docs, cov = _coverage_batch(d, p, k=4)
    # doc 1: [0,4)∪[2,6)∪[10,14) = 6 + 4 ; doc 2: [5,9)∪[6,10) = 5
    assert list(docs) == [1, 2]
    assert list(cov) == [10, 5]


def test_dup_span_coverage_matches_bruteforce(ray_session):
    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    texts = {}
    for d in range(40):
        n = int(rng.integers(4, 30))
        texts[d] = " ".join(vocab[i] for i in rng.integers(0, 5, n))
    # plant an exact shared span across two docs and a repeated
    # within-doc span
    texts[40] = "zeta eta theta iota kappa " + texts[0]
    texts[41] = "zeta eta theta iota kappa unique1 unique2 unique3"
    texts[42] = "one two three four one two three four"
    ref = brute_coverage(texts, k=4)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": pa.array([texts[d] for d in sorted(texts)])})) \
        .repartition(5)
    out = dup_span_coverage(ds, k=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    got = {int(r.doc_id): (int(r.n_tokens), int(r.dup_covered))
           for r in out.itertuples()}
    assert got == ref
    # the planted cross-doc span is fully covered
    assert got[41][1] >= 5


def test_dup_span_coverage_blocking_invariant(ray_session):
    texts = {d: " ".join(f"w{(d * 7 + i) % 11}" for i in range(12))
             for d in range(30)}
    tbl = pa.table({"doc_id": pa.array(sorted(texts), pa.int64()),
                    "text": pa.array([texts[d] for d in sorted(texts)])})
    outs = []
    for parts in (1, 3, 9):
        ds = rd.from_arrow(tbl).repartition(parts)
        df = dup_span_coverage(ds, k=4).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        outs.append(df)
    assert outs[0].equals(outs[1]) and outs[1].equals(outs[2])


def test_dup_span_coverage_join_route_equal(ray_session):
    texts = {d: " ".join(f"t{(d + i) % 6}" for i in range(10))
             for d in range(20)}
    tbl = pa.table({"doc_id": pa.array(sorted(texts), pa.int64()),
                    "text": pa.array([texts[d] for d in sorted(texts)])})
    ds = rd.from_arrow(tbl).repartition(3)
    a = dup_span_coverage(ds, k=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = dup_span_coverage(rd.from_arrow(tbl).repartition(3), k=3,
                          broadcast_rows=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_dup_span_trim_consistent_with_coverage(ray_session):
    from aida_ray.stages.substring import dup_span_trim
    texts = {d: " ".join(f"w{(d * 7 + i) % 11}" for i in range(12))
             for d in range(25)}
    texts[25] = "unique one two three four five six seven"
    tbl = pa.table({"doc_id": pa.array(sorted(texts), pa.int64()),
                    "text": pa.array([texts[d] for d in sorted(texts)])})
    ds = rd.from_arrow(tbl).repartition(4)
    trim = dup_span_trim(ds, k=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    cov = dup_span_coverage(rd.from_arrow(tbl).repartition(4), k=4) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # trimming removes exactly the covered positions
    assert (trim.n_removed.to_numpy() == cov.dup_covered.to_numpy()).all()
    # kept token count matches
    kept_tokens = trim.text_kept.map(
        lambda t: 0 if t == "" else len(t.split(" "))).to_numpy()
    # fully-trimmed docs serialize to "" which would re-split to 1 token;
    # reconstruct expected kept counts from coverage instead
    expect = cov.n_tokens.to_numpy() - cov.dup_covered.to_numpy()
    assert (np.where(trim.text_kept.to_numpy() == "", 0, kept_tokens)
            == expect).all()


def test_dup_span_coverage_tiny_docs(ray_session):
    # docs shorter than k grams in their own blocks must not crash
    tbl = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                    "text": pa.array(["a b", "a", "c d e f g c d e f g"])})
    out = dup_span_coverage(rd.from_arrow(tbl).repartition(3), k=4) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out.n_tokens) == [2, 1, 10]
    ref = brute_coverage({0: "a b", 1: "a",
                          2: "c d e f g c d e f g"}, k=4)
    got = {int(r.doc_id): (int(r.n_tokens), int(r.dup_covered))
           for r in out.itertuples()}
    assert got == ref
