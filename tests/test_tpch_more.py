"""Unit tests for the Q12/Q14/Q17/Q18/Q22-style plans, RFM
segmentation, and the term-NPMI aggregation: pandas/closed-form parity
plus blocking invariance on the distributed paths."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _li(n=300, seed=11):
    rng = np.random.default_rng(seed)
    return pa.table({
        "l_orderkey": rng.integers(0, 40, n),
        "l_partkey": rng.integers(0, 25, n),
        "l_quantity": rng.integers(1, 50, n).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900, 9000, n), 2),
        "l_discount": np.round(rng.choice([0.0, 0.05, 0.1], n), 2),
        "l_shipdate": pa.array(
            [np.datetime64("1996-01-01", "us")
             + np.timedelta64(int(d), "D")
             for d in rng.integers(0, 700, n)], pa.timestamp("us")),
    })


def test_small_qty_revenue_exact_predicate(ray_session):
    """qty·5·cnt < Σqty must EXCLUDE the boundary (==) row."""
    from aida_ray.stages.tpch_more import small_qty_revenue
    # part 1: qties [1, 9] → Σ=10, cnt=2; 0.2·avg = 1.0 → qty 1 is NOT
    # below (1·5·2 == 10), so nothing qualifies for part 1.
    # part 2: qties [1, 4, 25] → Σ=30, cnt=3; 0.2·avg = 2 → qty 1 only.
    tbl = pa.table({
        "l_partkey": [1, 1, 2, 2, 2],
        "l_quantity": [1.0, 9.0, 1.0, 4.0, 25.0],
        "l_extendedprice": [10.0, 10.0, 7.5, 10.0, 10.0]})
    out = small_qty_revenue(rd.from_arrow(tbl).repartition(3)) \
        .to_pandas()
    assert out.n_rows[0] == 1
    assert out.revenue_cents[0] == 750


def test_priority_counts_matches_pandas(ray_session):
    from aida_ray.stages.tpch_more import priority_counts_by_shipmonth
    li = _li()
    orders = pa.table({
        "o_orderkey": np.arange(40),
        "o_orderpriority": (["1-URGENT", "2-HIGH", "3-MEDIUM",
                             "4-NOT SPECIFIED"] * 10)})
    out = priority_counts_by_shipmonth(
        rd.from_arrow(li).repartition(5), rd.from_arrow(orders)) \
        .to_pandas().sort_values("ship_month").reset_index(drop=True)
    df = li.to_pandas()
    df["ship_month"] = df.l_shipdate.dt.strftime("%Y-%m")
    prio = dict(zip(orders["o_orderkey"].to_pylist(),
                    orders["o_orderpriority"].to_pylist()))
    df["hi"] = df.l_orderkey.map(
        lambda k: prio[k] in ("1-URGENT", "2-HIGH")).astype("int64")
    ref = df.groupby("ship_month").agg(
        high_count=("hi", "sum"),
        low_count=("hi", lambda s: int((1 - s).sum()))).reset_index()
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_big_orders_having_and_joinback(ray_session):
    from aida_ray.stages.tpch_more import big_orders
    li = pa.table({"l_orderkey": [1, 1, 2, 2, 3],
                   "l_quantity": [30.0, 25.0, 10.0, 10.0, 60.0]})
    orders = pa.table({
        "o_orderkey": [1, 2, 3],
        "o_custkey": [7, 8, 7],
        "o_orderdate": pa.array([np.datetime64("1996-03-01", "us")] * 3,
                                pa.timestamp("us")),
        "o_totalprice": [100.0, 200.0, 300.0]})
    cust = pa.table({"c_custkey": [7, 8], "c_name": ["X", "Y"]})
    out = big_orders(rd.from_arrow(li).repartition(2),
                     rd.from_arrow(orders), cust, min_qty=50) \
        .to_pandas()
    # orders 1 (55) and 3 (60) qualify; sorted by sum_qty DESC
    assert out.o_orderkey.tolist() == [3, 1]
    assert out.sum_qty.tolist() == [60, 55]
    assert out.c_name.tolist() == ["X", "X"]
    assert out.total_price_cents.tolist() == [30000, 10000]


def test_idle_high_balance_anti_join(ray_session):
    from aida_ray.stages.tpch_more import idle_high_balance
    cust = pa.table({
        "c_custkey": [1, 2, 3, 4],
        "c_nationkey": [0, 0, 1, 1],
        # positives: 100, 300 → avg 200; rich = {2 (300), 4 (250)}...
        "c_acctbal": [100.0, 300.0, -50.0, 250.0]})
    orders = pa.table({
        "o_custkey": [2],
        "o_orderdate": pa.array([np.datetime64("2001-01-01", "us")],
                                pa.timestamp("us"))})
    out = idle_high_balance(
        rd.from_arrow(cust).repartition(2), rd.from_arrow(orders),
        cutoff="2000-01-01").to_pandas() \
        .sort_values("c_nationkey").reset_index(drop=True)
    # avg positive = (100+300+250)/3 = 216.67 → rich = {2, 4};
    # 2 ordered recently → idle rich = {4} in nation 1
    assert out.c_nationkey.tolist() == [1]
    assert out.n_custs.tolist() == [1]
    assert out.total_bal_cents.tolist() == [25000]


def test_ntile_matches_sql_semantics():
    from aida_ray.stages.sequences import _ntile
    # n=10, k=4 → sizes 3,3,2,2
    got = _ntile(np.arange(10), 10, 4)
    assert got.tolist() == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]
    # n=8, k=4 → even 2,2,2,2
    assert _ntile(np.arange(8), 8, 4).tolist() == \
        [1, 1, 2, 2, 3, 3, 4, 4]
    # n < k → first n buckets of size 1
    assert _ntile(np.arange(3), 3, 4).tolist() == [1, 2, 3]


def test_rfm_segments_deterministic(ray_session):
    from aida_ray.stages.sequences import rfm_segments
    n = 40
    rng = np.random.default_rng(3)
    ev = pa.table({
        "user_id": rng.integers(0, 12, n),
        "ts": pa.array([np.datetime64("2024-01-01", "us")
                        + np.timedelta64(int(s), "s")
                        for s in rng.integers(0, 10**6, n)],
                       pa.timestamp("us")),
        "value": np.round(rng.uniform(0, 100, n), 2)})
    a = rfm_segments(rd.from_arrow(ev), k=4).to_pandas()
    b = rfm_segments(rd.from_arrow(ev).repartition(7), k=4).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    # scores are a permutation-respecting bucketing: user with the
    # globally max frequency must hold f_score 1
    top = a.loc[a.frequency.idxmax()]
    assert top.f_score == 1
    assert set(a.columns) == {"user_id", "recency_us", "frequency",
                              "monetary_1e6", "r_score", "f_score",
                              "m_score", "rfm"}


def test_term_npmi_planted_counts(ray_session):
    from aida_ray.stages.textstats import term_cooccurrence_npmi
    docs = pa.table({"text": [
        "alpha beta", "alpha beta", "alpha gamma", "delta",
        "beta gamma alpha", "unrelated words here"]})
    out = term_cooccurrence_npmi(
        rd.from_arrow(docs).repartition(3),
        ["alpha", "beta", "gamma"]).to_pandas()
    row = out[(out.term_a == "alpha") & (out.term_b == "beta")].iloc[0]
    assert (row.n_a, row.n_b, row.n_ab) == (4, 3, 3)
    nd = 6
    pij, pi, pj = 3 / nd, 4 / nd, 3 / nd
    assert abs(row.npmi
               - np.log(pij / (pi * pj)) / -np.log(pij)) < 1e-12
    # pair never co-occurring is absent
    assert not ((out.term_a == "beta")
                & (out.term_b == "delta")).any()


def test_chunk_documents_boundaries(ray_session):
    from aida_ray.stages.packing import chunk_documents
    docs = pa.table({
        "doc_id": [1, 2, 3],
        "text": ["a b c d e",            # 5 tokens
                 " ".join(f"t{i}" for i in range(8)),   # 8 tokens
                 "solo"]})               # 1 token
    out = chunk_documents(rd.from_arrow(docs), chunk_size=4,
                          stride=3).to_pandas() \
        .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    # doc 1 (5 toks): chunks [0:4], [3:5] → 2 chunks
    d1 = out[out.doc_id == 1]
    assert d1.chunk_text.tolist() == ["a b c d", "d e"]
    assert d1.n_chunk_tokens.tolist() == [4, 2]
    # doc 2 (8 toks): starts 0,3,6 → 3 chunks, last has 2 tokens
    d2 = out[out.doc_id == 2]
    assert d2.chunk_idx.tolist() == [0, 1, 2]
    assert d2.n_chunk_tokens.tolist() == [4, 4, 2]
    # doc 3: single short chunk
    d3 = out[out.doc_id == 3]
    assert d3.chunk_text.tolist() == ["solo"]
    # blocking invariance
    out7 = chunk_documents(rd.from_arrow(docs).repartition(3),
                           chunk_size=4, stride=3).to_pandas() \
        .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out7)


def test_late_only_suppliers_semantics(ray_session):
    from aida_ray.stages.tpch_more import late_only_suppliers
    d0 = np.datetime64("1996-01-01", "us")

    def day(n):
        return d0 + np.timedelta64(n, "D")

    # order 1: suppliers 0 (late) and 5 (on time) → supplier 0 guilty
    # order 2: suppliers 3, 4 both late → nobody (n_late = 2)
    # order 3: single supplier 0 late → nobody (n < 2)
    li = pa.table({
        "l_orderkey": [1, 1, 2, 2, 3],
        "l_suppkey": [0, 5, 3, 4, 0],
        "l_shipdate": pa.array([day(200), day(10), day(200),
                                day(300), day(400)],
                               pa.timestamp("us"))})
    orders = pa.table({
        "o_orderkey": [1, 2, 3],
        "o_orderdate": pa.array([day(0)] * 3, pa.timestamp("us"))})
    out = late_only_suppliers(
        rd.from_arrow(li).repartition(2), rd.from_arrow(orders),
        late_days=90).to_pandas()
    assert out.s_suppkey.tolist() == [0]
    assert out.numwait.tolist() == [1]


def test_activity_islands_splits(ray_session):
    from aida_ray.stages.sequences import activity_islands
    day = 86_400_000_000
    ev = pa.table({
        "user_id": [1, 1, 1, 1, 2],
        # user 1 active days 0,1,2 then 5; user 2 day 9
        "ts": pa.array([0, day, 2 * day + 5, 5 * day, 9 * day],
                       pa.timestamp("us"))})
    out = activity_islands(rd.from_arrow(ev).repartition(3)) \
        .to_pandas().sort_values(["user_id", "start_day"]) \
        .reset_index(drop=True)
    assert out.values.tolist() == [[1, 0, 3], [1, 5, 1], [2, 9, 1]]


def test_mention_contexts_window_clipping(ray_session):
    from aida_ray.stages.textstats import mention_contexts
    docs = pa.table({"doc_id": [7],
                     "text": ["spark a b spark c"]})
    out = mention_contexts(rd.from_arrow(docs), ["spark"], window=2) \
        .to_pandas().sort_values("pos").reset_index(drop=True)
    assert out.pos.tolist() == [1, 4]
    assert out.context.tolist() == ["spark a b", "a b spark c"]


def test_build_word_ids_dense_sorted(ray_session):
    from aida_ray.stages.textstats import build_word_ids
    docs = pa.table({"text": ["b a c", "a d", "d d b"]})
    out = build_word_ids(rd.from_arrow(docs).repartition(3)) \
        .to_pandas()
    assert out.word.tolist() == ["a", "b", "c", "d"]
    assert out.word_id.tolist() == [1, 2, 3, 4]


def test_snapshot_diff_statuses(ray_session):
    from aida_ray.stages.incremental import snapshot_diff
    old = pa.table({"url": ["a", "b", "c"],
                    "content_hash": ["h1", "h2", "h3"]})
    new = pa.table({"url": ["b", "c", "d"],
                    "content_hash": ["h2", "hX", "h4"]})
    out = snapshot_diff(rd.from_arrow(old).repartition(2),
                        rd.from_arrow(new).repartition(2)) \
        .to_pandas().sort_values("url").reset_index(drop=True)
    assert dict(zip(out.url, out.status)) == {
        "a": "removed", "b": "same", "c": "changed", "d": "added"}


def test_label_centroids_exact_means(ray_session):
    from aida_ray.stages.ml import label_centroids
    emb = pa.table({
        "embedding": pa.array([[1.0, 2.0], [3.0, 4.0], [10.0, 0.0]],
                              pa.list_(pa.float32())),
        "label": [1, 1, 2]})
    out = label_centroids(rd.from_arrow(emb).repartition(3)) \
        .to_pandas().sort_values(["label", "pos"]) \
        .reset_index(drop=True)
    assert out.sum_1e6.tolist() == [4_000_000, 6_000_000,
                                    10_000_000, 0]
    assert out.n_vecs.tolist() == [2, 2, 1, 1]
    assert out.centroid.tolist() == [2_000_000.0, 3_000_000.0,
                                     10_000_000.0, 0.0]


def test_zscore_outliers_integer_predicate(ray_session):
    from aida_ray.stages.relational import group_zscore_outliers
    # group 1: values 10×1.0 and one 100.0 → the 100 is way out
    vals = [1.0] * 10 + [100.0]
    ev = pa.table({"event_id": list(range(11)),
                   "user_id": [1] * 11,
                   "value": vals})
    out = group_zscore_outliers(
        rd.from_arrow(ev).repartition(3), "user_id", "value",
        "event_id", k=2).to_pandas()
    assert out.event_id.tolist() == [10]
    # singleton group: never an outlier (n < 2)
    ev1 = pa.table({"event_id": [0], "user_id": [9],
                    "value": [5.0]})
    out1 = group_zscore_outliers(rd.from_arrow(ev1), "user_id",
                                 "value", "event_id").to_pandas()
    assert len(out1) == 0


def test_zscore_outliers_object_int_fallback(ray_session):
    """ADVICE r2: terms like (v*n-s)^2*(n-1) can exceed int64 even
    under the input asserts — the batch must promote to Python ints,
    not wrap.  999 zeros + one 20000.00 in one group: lhs ~3.99e21 and
    rhs ~1.6e19 both overflow int64; exact math flags only the big
    row (z ~= 31.6)."""
    from aida_ray.stages.relational import group_zscore_outliers
    n = 1000
    vals = [0.0] * (n - 1) + [20000.0]
    ev = pa.table({"event_id": list(range(n)),
                   "user_id": [1] * n,
                   "value": vals})
    out = group_zscore_outliers(
        rd.from_arrow(ev).repartition(4), "user_id", "value",
        "event_id", k=2).to_pandas()
    assert out.event_id.tolist() == [n - 1]


def test_zscore_outliers_empty_input(ray_session):
    from aida_ray.stages.relational import group_zscore_outliers
    ev = pa.table({"event_id": pa.array([], pa.int64()),
                   "user_id": pa.array([], pa.int64()),
                   "value": pa.array([], pa.float64())})
    out = group_zscore_outliers(rd.from_arrow(ev), "user_id",
                                "value", "event_id").to_pandas()
    assert len(out) == 0


def test_big_orders_unknown_custkey_dropped(ray_session):
    """ADVICE r2: an o_custkey missing from the customer dimension
    must drop the row (inner-join semantics), not IndexError past
    max(ckeys) or alias a neighbouring customer's name."""
    from aida_ray.stages.tpch_more import big_orders
    li = pa.table({"l_orderkey": [1, 2],
                   "l_quantity": [60.0, 70.0]})
    orders = pa.table({
        "o_orderkey": [1, 2],
        "o_custkey": [7, 99],          # 99 > max(c_custkey): OOB probe
        "o_orderdate": pa.array([np.datetime64("1996-03-01", "us")] * 2,
                                pa.timestamp("us")),
        "o_totalprice": [100.0, 200.0]})
    cust = pa.table({"c_custkey": [7, 8], "c_name": ["X", "Y"]})
    out = big_orders(rd.from_arrow(li), rd.from_arrow(orders), cust,
                     min_qty=50).to_pandas()
    assert out.o_orderkey.tolist() == [1]
    assert out.c_name.tolist() == ["X"]
