"""SemDeDup (clustered semantic dedup) and DSIR importance weights."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _blob_ds(parts=5, seed=7, plant_every=10):
    """Three separated blobs + exact duplicate copies of every
    ``plant_every``-th vector at id+1000."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1, (3, 6)) * 5
    x = np.concatenate([
        centers[i] + rng.normal(0, 2.0, (60, 6)) for i in range(3)])
    ids = np.arange(len(x))
    # precondition: no non-planted pair crosses the 0.999 threshold
    normed = x / np.linalg.norm(x, axis=1, keepdims=True)
    sims = normed @ normed.T
    np.fill_diagonal(sims, 0)
    assert sims.max() < 0.999
    dup_ids = ids[ids % plant_every == 0]
    x_all = np.concatenate([x, x[dup_ids]])
    ids_all = np.concatenate([ids, dup_ids + 1000])
    ds = rd.from_arrow(pa.table({
        "vec_id": ids_all,
        "embedding": list(x_all.astype(np.float32))})).repartition(parts)
    return ds, dup_ids


def _sorted_pairs(ds):
    df = ds.to_pandas().sort_values("removed_id").reset_index(drop=True)
    return list(zip(df["kept_id"], df["removed_id"]))


def test_semdedup_removes_planted_exact_dups(ray_session):
    from aida_ray.stages.dedup import semdedup
    ds, dup_ids = _blob_ds()
    got = _sorted_pairs(semdedup(ds, k=3, cosine_threshold=0.999))
    assert got == [(i, i + 1000) for i in dup_ids]


def test_semdedup_blocking_invariant(ray_session):
    from aida_ray.stages.dedup import semdedup
    ds1, _ = _blob_ds(parts=3)
    ds2, _ = _blob_ds(parts=9)
    assert _sorted_pairs(semdedup(ds1, k=3)) == \
        _sorted_pairs(semdedup(ds2, k=3))


def test_semdedup_clean_input_removes_nothing(ray_session):
    from aida_ray.stages.dedup import semdedup
    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, (80, 5))
    ds = rd.from_arrow(pa.table({
        "vec_id": np.arange(80), "embedding": list(x.astype(np.float32))}))
    assert semdedup(ds, k=4, cosine_threshold=0.9999).count() == 0


DOCS = [
    (0, "en", "the quick brown fox jumps over the lazy dog"),
    (1, "en", "the fast data table scan"),
    (2, "de", "der schnelle braune fuchs"),
    (3, "de", "daten tabelle scan schnell"),
    (4, "en", "quick scan of the data table"),
    (5, "fr", "le renard brun rapide"),
    (6, "en", ""),
]


def _doc_ds(parts=3):
    ids, langs, texts = zip(*DOCS)
    return rd.from_arrow(pa.table({
        "doc_id": list(ids), "lang": list(langs),
        "text": list(texts)})).repartition(parts)


def _brute_weights(n_buckets=64):
    from aida_ray.stages.importance import (_doc_buckets, log_ratio_table)
    raw = np.zeros(n_buckets, np.int64)
    tgt = np.zeros(n_buckets, np.int64)
    per_doc = {}
    for did, lang, text in DOCS:
        bs = _doc_buckets(text, n_buckets)
        per_doc[did] = bs
        np.add.at(raw, bs, 1)
        if lang == "en":
            np.add.at(tgt, bs, 1)
    lr6 = log_ratio_table(raw, tgt)
    return {did: (int(lr6[bs].sum()), len(bs))
            for did, bs in per_doc.items()}


def test_dsir_matches_brute_force(ray_session):
    from aida_ray.stages.importance import dsir_weights
    got = dsir_weights(_doc_ds(), n_buckets=64).to_pandas() \
        .set_index("doc_id")
    want = _brute_weights(64)
    for did, (w6, ng) in want.items():
        assert got.loc[did, "weight6"] == w6
        assert got.loc[did, "n_grams"] == ng
        assert got.loc[did, "weight"] == w6 / 1e6


def test_dsir_blocking_invariant_and_target_signal(ray_session):
    from aida_ray.stages.importance import dsir_weights
    a = dsir_weights(_doc_ds(2), n_buckets=64).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = dsir_weights(_doc_ds(5), n_buckets=64).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # English docs must score higher per-gram than non-English ones
    a["lang"] = [d[1] for d in DOCS]
    a = a[a.n_grams > 0]
    per_gram = a.weight6 / a.n_grams
    assert per_gram[a.lang == "en"].mean() > per_gram[a.lang != "en"].mean()


def test_semdedup_empty_input(ray_session):
    from aida_ray.stages.dedup import semdedup
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32()))}))
    assert semdedup(ds, k=3).count() == 0


def test_dsir_empty_input(ray_session):
    from aida_ray.stages.importance import dsir_weights
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "lang": pa.array([], pa.string()),
        "text": pa.array([], pa.string())}))
    assert dsir_weights(ds, n_buckets=32).count() == 0


def test_watermark_late_matches_brute_force(ray_session):
    from aida_ray.stages.sessions import watermark_late
    rng = np.random.default_rng(11)
    n = 500
    ts = rng.integers(0, 10_000, n).astype(np.int64)
    arr = rng.integers(0, 50, n).astype(np.int64)   # heavy arrival ties
    ids = np.arange(n, dtype=np.int64)
    L = 4000

    order = np.lexsort((ids, arr))
    wm, cur, want = {}, None, {}
    for i in order:
        if cur is not None and cur - ts[i] > L:
            want[int(ids[i])] = int(cur - ts[i])
        cur = ts[i] if cur is None else max(cur, ts[i])

    for parts in (3, 8):
        ds = rd.from_arrow(pa.table({
            "event_id": ids,
            "ts": pa.array(ts, pa.int64()),
            "arr": arr})).repartition(parts)
        got = watermark_late(ds, lateness_us=L, partitions=7).to_pandas()
        got_map = dict(zip(got["event_id"].astype(int),
                           got["late_us"].astype(int)))
        assert got_map == want


def test_watermark_late_in_order_stream_is_clean(ray_session):
    from aida_ray.stages.sessions import watermark_late
    n = 200
    ds = rd.from_arrow(pa.table({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pa.array(np.arange(n, dtype=np.int64) * 100, pa.int64()),
        "arr": np.arange(n, dtype=np.int64)}))
    assert watermark_late(ds, lateness_us=0).count() == 0


def test_stream_interval_join_matches_brute_force(ray_session):
    from aida_ray.stages.range_join import stream_interval_join
    n = 400
    D = 50
    r5, r6 = np.random.default_rng(5), np.random.default_rng(6)
    lk = r5.integers(0, 12, n).astype(np.int64)
    lt = r5.integers(0, 1000, n).astype(np.int64)
    rk = r6.integers(0, 12, n).astype(np.int64)
    rt = r6.integers(0, 1000, n).astype(np.int64)

    def side_ds(seed_off, parts):
        k, t = (lk, lt) if seed_off == 0 else (rk, rt)
        return rd.from_arrow(pa.table({
            "k": k,
            "id": np.arange(seed_off * 10000, seed_off * 10000 + n,
                            dtype=np.int64),
            "t": t,
        })).repartition(parts)

    want = set()
    for i in range(n):
        for j in range(n):
            if lk[i] == rk[j] and abs(int(lt[i]) - int(rt[j])) <= D:
                want.add((int(i), int(10000 + j),
                          int(rt[j]) - int(lt[i])))
    assert want  # the fixture must actually exercise matches

    for parts in (2, 7):
        got = stream_interval_join(
            side_ds(0, parts), side_ds(1, parts),
            key="k", ts_col="t", id_col="id",
            delta_us=D, partitions=5).to_pandas()
        got_set = set(zip(got["l_id"].astype(int),
                          got["r_id"].astype(int),
                          got["dt_us"].astype(int)))
        assert got_set == want


def test_pq_lossless_on_grid_and_blocking_invariant(ray_session):
    from aida_ray.stages.knn import pq_encode, pq_topk, pq_train
    ids = np.arange(300, dtype=np.int64)
    v = np.zeros((300, 4))
    v[:, 0] = ids % 3
    v[:, 2] = ids % 4
    for parts in (2, 6):
        ds = rd.from_arrow(pa.table({
            "vec_id": ids, "vec": list(v)})).repartition(parts)
        books = pq_train(ds, m=2, ks=[3, 4], vec_col="vec",
                         id_col="vec_id")
        # codebooks recover the planted value sets (up to float ulp)
        assert sorted(np.round(books[0][:, 0]).astype(int)) == [0, 1, 2]
        assert sorted(np.round(books[1][:, 0]).astype(int)) == [0, 1, 2, 3]
        codes = pq_encode(ds, books, vec_col="vec", id_col="vec_id")
        q = np.zeros((1, 4))
        q[0, 0] = 17 % 3
        q[0, 2] = 17 % 4
        top = pq_topk(codes, books, q, k=1, id_col="vec_id")
        # min id congruent to 17 mod lcm(3,4)=12 is 5
        assert top["vec_id"].to_pylist() == [5]


def test_pq_adc_recall_vs_brute_force(ray_session):
    from aida_ray.stages.knn import pq_encode, pq_topk, pq_train
    rng = np.random.default_rng(13)
    x = rng.normal(0, 1, (400, 8))
    ids = np.arange(400, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"vec_id": ids, "vec": list(x)}))
    books = pq_train(ds, m=4, ks=16, vec_col="vec", id_col="vec_id",
                     iters=6)
    codes = pq_encode(ds, books, vec_col="vec", id_col="vec_id")
    Q = x[:20]  # corpus vectors as queries: true top-1 is themselves
    top = pq_topk(codes, books, Q, k=5, id_col="vec_id").to_pandas()
    hits = sum(int(qi) in set(top[top["query"] == qi]["vec_id"])
               for qi in range(20))
    assert hits >= 15  # >=75% top-5 self-recall at 8x compression


def test_semdedup_zero_vectors_are_exact_dups(ray_session):
    from aida_ray.stages.dedup import semdedup
    rng = np.random.default_rng(21)
    x = rng.normal(0, 1, (40, 4))
    x[[3, 17, 29]] = 0.0  # three exact-duplicate zero vectors
    ds = rd.from_arrow(pa.table({
        "vec_id": np.arange(40, dtype=np.int64),
        "embedding": list(x.astype(np.float32))}))
    got = _sorted_pairs(semdedup(ds, k=2, cosine_threshold=0.9999))
    assert got == [(3, 17), (3, 29)]


def test_stream_interval_join_overflow_fallback_route_equal(ray_session):
    from aida_ray.stages.range_join import stream_interval_join
    n = 300
    r = np.random.default_rng(9)
    k = r.integers(0, 10, n).astype(np.int64)
    t = r.integers(0, 800, n).astype(np.int64)

    def mk(parts):
        return rd.from_arrow(pa.table({
            "k": k, "id": np.arange(n, dtype=np.int64), "t": t,
        })).repartition(parts)

    def run(cap):
        df = stream_interval_join(
            mk(3), mk(4), key="k", ts_col="t", id_col="id",
            delta_us=40, partitions=4, _max_composite=cap).to_pandas()
        return sorted(zip(df["l_id"], df["r_id"], df["dt_us"]))

    fast = run((1 << 63) - 1)
    safe = run(1)           # force the per-key-segment route
    assert fast == safe and len(fast) > 0


def test_ivfpq_full_probe_equals_plain_pq(ray_session):
    from aida_ray.stages.knn import (ivfpq_build, ivfpq_topk, pq_encode,
                                     pq_topk, pq_train)
    rng = np.random.default_rng(31)
    x = rng.normal(0, 1, (300, 8))
    ids = np.arange(300, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"vec_id": ids, "vec": list(x)}))
    cents, books, enc = ivfpq_build(ds, n_cells=5, m=4, ks=8,
                                    vec_col="vec", id_col="vec_id")
    Q = x[:8]
    # probing EVERY cell must reproduce the plain-PQ scan exactly
    # (same codebooks: ivfpq_build trains PQ on the same compacted ds
    # with the same deterministic seeding as pq_train standalone)
    full = ivfpq_topk(enc, cents, books, Q, k=3,
                      n_probe=5).to_pandas()
    books2 = pq_train(ds, m=4, ks=8, vec_col="vec", id_col="vec_id")
    assert all(np.allclose(a, b) for a, b in zip(books, books2))
    plain = pq_topk(pq_encode(ds, books2, vec_col="vec",
                              id_col="vec_id"), books2, Q, k=3).to_pandas()
    assert full[["query", "vec_id"]].values.tolist() == \
        plain[["query", "vec_id"]].values.tolist()
    # n_probe=1 still finds each query's own vector (it lives in the
    # probed cell by construction: query == corpus vector)
    one = ivfpq_topk(enc, cents, books, Q, k=1, n_probe=1).to_pandas()
    assert one["vec_id"].tolist() == list(range(8))
