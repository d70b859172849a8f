"""Funnel analysis: first-touch ordering, strict-timestamp semantics,
blocking invariance."""

import pyarrow as pa

import ray.data as rd

TS = pa.array([1, 2, 3, 5, 5, 7, 9, 11, 12, 13], pa.timestamp("us"))


def _events():
    #  user 1: view@1 -> click@3 -> purchase@7   (full funnel)
    #  user 2: click@2 before its view@5; purchase@5 NOT after click
    #          (strict): view@5 -> click@9 needed but click is @2 only
    #  user 3: view@11 -> click@12 -> view@13 (no purchase)
    return pa.table({
        "user_id": [1, 2, 1, 2, 2, 1, 2, 3, 3, 3],
        "ts": TS,
        "event_type": ["view", "click", "click", "view", "purchase",
                       "purchase", "other", "view", "click", "view"],
    })


def test_funnel_depths_strict_ordering(ray_session):
    from aida_ray.stages.funnel import funnel_depths
    out = funnel_depths(rd.from_arrow(_events()),
                        ["view", "click", "purchase"]) \
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    assert out.depth.tolist() == [3, 1, 2]
    # user 2: click@2 precedes view@5 and purchase@5 is not strictly
    # after the view -> stalls at stage 1


def test_funnel_counts_and_blocking(ray_session):
    from aida_ray.stages.funnel import funnel_counts
    t = funnel_counts(rd.from_arrow(_events()),
                      ["view", "click", "purchase"]).to_pandas()
    assert t.stage.tolist() == ["view", "click", "purchase"]
    assert t.users.tolist() == [3, 2, 1]
    t7 = funnel_counts(rd.from_arrow(_events()).repartition(7),
                       ["view", "click", "purchase"]).to_pandas()
    assert t7.users.tolist() == [3, 2, 1]
