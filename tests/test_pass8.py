"""Unit tests for the pass-8 operators: Q6/Q11 closers, the FastSS
edit-distance join, link-graph extraction, robots-style prefix
filtering, and the sliding exact median — pandas/brute-force parity
plus blocking invariance on every distributed path."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _lineitem(n=300, seed=11):
    rng = np.random.default_rng(seed)
    return pa.table({
        "l_partkey": rng.integers(0, 25, n),
        "l_quantity": rng.integers(1, 50, n).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900, 9000, n), 2),
        "l_discount": np.round(rng.choice(
            [0.0, 0.04, 0.05, 0.06, 0.07, 0.1], n), 2),
        "l_shipdate": pa.array(
            [np.datetime64("1996-06-01", "us")
             + np.timedelta64(int(d), "D")
             for d in rng.integers(0, 700, n)], pa.timestamp("us")),
    })


def _brute_q6(t: pa.Table) -> tuple[int, int]:
    df = t.to_pandas()
    cents = np.round(df["l_extendedprice"] * 100).astype("int64")
    disc = np.round(df["l_discount"] * 100).astype("int64")
    qty = np.round(df["l_quantity"]).astype("int64")
    m = ((df["l_shipdate"] >= np.datetime64("1997-01-01"))
         & (df["l_shipdate"] < np.datetime64("1998-01-01"))
         & (disc >= 5) & (disc <= 7) & (qty < 24))
    return int((cents[m] * disc[m]).sum()), int(m.sum())


def test_filtered_revenue_parity(ray_session):
    from aida_ray.stages.tpch_wide import filtered_revenue
    t = _lineitem()
    want_rev, want_n = _brute_q6(t)
    for blocks in (1, 7):
        out = filtered_revenue(
            rd.from_arrow(t).repartition(blocks))
        assert out["revenue_cc"][0].as_py() == want_rev
        assert out["n_rows"][0].as_py() == want_n


def test_filtered_revenue_empty(ray_session):
    from aida_ray.stages.tpch_wide import filtered_revenue
    out = filtered_revenue(rd.from_arrow(_lineitem(4)).filter(
        lambda r: False))
    assert out["revenue_cc"][0].as_py() == 0
    assert out["n_rows"][0].as_py() == 0


def test_important_parts_parity(ray_session):
    from aida_ray.stages.tpch_wide import important_parts
    t = _lineitem()
    df = t.to_pandas()
    df["cents"] = np.round(df["l_extendedprice"] * 100).astype("int64")
    v = df.groupby("l_partkey")["cents"].sum()
    want = v[v * len(v) * 2 > int(v.sum()) * 3].sort_values(
        ascending=False)
    for blocks in (1, 5):
        out = important_parts(rd.from_arrow(t).repartition(blocks),
                              mult_num=3, mult_den=2).to_pandas()
        assert len(out) == len(want)
        got = dict(zip(out["l_partkey"], out["value_cents"]))
        assert got == {int(k): int(x) for k, x in want.items()}
        # sorted by value desc
        assert list(out["value_cents"]) == sorted(
            out["value_cents"], reverse=True)


# ------------------------------------------------------------ edit distance


def test_within_one_exhaustive():
    from aida_ray.stages.editdist import _within_one

    def lev(a, b):
        m, n = len(a), len(b)
        d = np.zeros((m + 1, n + 1), int)
        d[:, 0] = np.arange(m + 1)
        d[0, :] = np.arange(n + 1)
        for i in range(1, m + 1):
            for j in range(1, n + 1):
                d[i, j] = min(d[i - 1, j] + 1, d[i, j - 1] + 1,
                              d[i - 1, j - 1] + (a[i - 1] != b[j - 1]))
        return d[m, n]

    import itertools
    vocab = ["".join(p) for k in range(4)
             for p in itertools.product("ab", repeat=k)]
    for a in vocab:
        for b in vocab:
            assert _within_one(a, b) == (lev(a, b) <= 1), (a, b)


def test_edit1_join_bruteforce(ray_session):
    from aida_ray.stages.editdist import edit1_join

    names = ["kitten", "sitten", "sittin", "kittens", "itten",
             "ab", "ba", "abc", "cab", "x", "y", "",
             "same", "same2", "samme", "sam",
             "Z" * 70, "Z" * 70 + "q"]   # over max_len -> ignored
    t = pa.table({"id": pa.array(range(len(names)), pa.int64()),
                  "s": pa.array(names, pa.string())})

    def lev(a, b):
        if len(a) > len(b):
            a, b = b, a
        prev = list(range(len(a) + 1))
        for j, cb in enumerate(b, 1):
            cur = [j]
            for i, ca in enumerate(a, 1):
                cur.append(min(prev[i] + 1, cur[-1] + 1,
                               prev[i - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = set()
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a, b = names[i], names[j]
            if len(a) > 64 or len(b) > 64 or a == b:
                continue
            if lev(a, b) <= 1:
                want.add(tuple(sorted((a, b))))

    for blocks in (1, 4):
        out = edit1_join(rd.from_arrow(t).repartition(blocks),
                         "id", "s").to_pandas()
        got = set(zip(out["str_a"], out["str_b"]))
        assert got == want
        # string-order convention
        assert all(a < b for a, b in got)


def test_edit1_join_no_pairs(ray_session):
    from aida_ray.stages.editdist import edit1_join
    t = pa.table({"id": pa.array([1, 2], pa.int64()),
                  "s": pa.array(["alpha", "omega12345"], pa.string())})
    out = edit1_join(rd.from_arrow(t), "id", "s").to_pandas()
    assert len(out) == 0


# -------------------------------------------------------------- link graph


def test_extract_links_and_host_stats(ray_session):
    from aida_ray.stages.links import extract_links, host_link_stats
    pages = pa.table({
        "url": pa.array(["u1", "u2", "u3", "u4"], pa.string()),
        "html": pa.array([
            b'<p>x</p><a href="http://A.com/1">a</a>'
            b'<A CLASS="z" HREF="http://a.com/2">b</A>',
            b'<a href="https://b.com/">only</a>'
            b'<a data-x="1" href="http://A.com/3">again</a>',
            b'no links here',
            None,
        ], pa.binary())})
    for blocks in (1, 3):
        ds = rd.from_arrow(pages).repartition(blocks)
        links = extract_links(ds).to_pandas()
        assert len(links) == 4
        out = host_link_stats(extract_links(ds)).to_pandas() \
            .set_index("host")
        assert out.loc["a.com", "n_links"] == 3
        assert out.loc["a.com", "n_sources"] == 2
        assert out.loc["b.com", "n_links"] == 1
        assert out.loc["b.com", "n_sources"] == 1


def test_robots_filter_semantics(ray_session):
    from aida_ray.stages.links import robots_filter
    urls = ["http://h1.com/p/10",      # blocked: /p/1 prefix
            "http://h1.com/p/2",       # not blocked
            "http://h1.com/p/1",       # blocked: exact == prefix
            "http://H1.com/p/11",      # blocked: host case-folded
            "http://h2.com/anything",  # blocked: "/" rule
            "http://h2.com",           # blocked: empty path -> "/"
            "http://h3.com/p/1",       # no rule for h3
            "not a url"]               # never blocked
    rules = [("H1.com", "/p/1"), ("h2.com", "/")]
    t = pa.table({"url": pa.array(urls, pa.string())})
    out = robots_filter(rd.from_arrow(t), rules).to_pandas()
    got = dict(zip(out["url"], out["blocked"]))
    assert got == {
        "http://h1.com/p/10": True, "http://h1.com/p/2": False,
        "http://h1.com/p/1": True, "http://H1.com/p/11": True,
        "http://h2.com/anything": True, "http://h2.com": True,
        "http://h3.com/p/1": False, "not a url": False}


# ----------------------------------------------------------- rolling median


def _events_tbl(n=250, keys=7, seed=3):
    rng = np.random.default_rng(seed)
    return pa.table({
        "event_id": np.arange(n),
        "user_id": rng.integers(0, keys, n),
        "ts": pa.array(
            [np.datetime64("2024-01-01", "us")
             + np.timedelta64(int(x), "m")
             for x in rng.integers(0, 10_000, n)], pa.timestamp("us")),
        "value": np.round(rng.uniform(-50, 50, n), 2),
    })


def _pandas_frame_median2(t: pa.Table, frame: int) -> dict[int, int]:
    df = t.to_pandas()
    df["cents"] = np.round(df["value"] * 100).astype("int64")
    out = {}
    for _, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        vals = g["cents"].to_numpy()
        for pos, eid in enumerate(g["event_id"]):
            w = np.sort(vals[max(0, pos - frame + 1):pos + 1])
            m = len(w)
            out[int(eid)] = int(w[m // 2] * 2) if m % 2 \
                else int(w[m // 2 - 1] + w[m // 2])
    return out


def test_sliding_frame_median_parity(ray_session):
    from aida_ray.stages.windows import sliding_frame_median
    t = _events_tbl()
    for frame in (1, 4, 7):
        want = _pandas_frame_median2(t, frame)
        for blocks in (1, 6):
            out = sliding_frame_median(
                rd.from_arrow(t).repartition(blocks),
                frame=frame).to_pandas()
            got = dict(zip(out["event_id"],
                           out["frame_median_cents_x2"]))
            assert got == want, f"frame={frame} blocks={blocks}"
