"""Empty-input / odd-blocking robustness for the session-4 stages —
the CORRECTNESS_r02 `contamination` failure was an empty-block schema
crash, so every new operator gets the same hostile inputs."""

import numpy as np
import pyarrow as pa
import pytest


def _empty(schema_cols):
    return pa.table({c: pa.array([], t) for c, t in schema_cols})


def test_bm25_empty_corpus(ray_session):
    import ray.data
    from aida_ray.stages.retrieval import bm25_topk
    ds = ray.data.from_arrow(_empty([("doc_id", pa.int64()),
                                     ("text", pa.string())]))
    out = bm25_topk(ds, queries=[(0, ["x"])], k=3)
    assert out.num_rows == 0


def test_hearst_and_quotes_and_acronyms_empty(ray_session):
    import ray.data
    from aida_ray.stages.hearst import (acronym_definitions, hearst_isa,
                                        quotes)
    ds = ray.data.from_arrow(_empty([("doc_id", pa.int64()),
                                     ("text", pa.string())]))
    assert hearst_isa(ds).count() == 0
    assert quotes(ds).count() == 0
    assert acronym_definitions(ds).count() == 0
    # null text rows must not crash
    ds2 = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array([None], pa.string())}))
    assert hearst_isa(ds2).count() == 0


def test_fuse_empty_and_single_block(ray_session):
    import ray.data
    from aida_ray.stages.fuse import noisy_or_fuse
    ds = ray.data.from_arrow(_empty([("subj", pa.string()),
                                     ("pred", pa.string()),
                                     ("obj", pa.string()),
                                     ("conf", pa.float64())]))
    assert noisy_or_fuse(ds).count() == 0


def test_kgqa_empty(ray_session):
    import ray.data
    from aida_ray.stages.kgqa import (dangling_objects,
                                      functional_violations)
    tr = ray.data.from_arrow(_empty([("subj", pa.string()),
                                     ("pred", pa.string()),
                                     ("obj", pa.string())]))
    assert functional_violations(tr, ["p"]).count() == 0
    ents = ray.data.from_arrow(pa.table(
        {"entity": pa.array(["e"], pa.string())}))
    assert dangling_objects(tr, ents).count() == 0


def test_temporal_and_burst_empty(ray_session):
    import ray.data
    from aida_ray.stages.temporal import validity_intervals
    from aida_ray.stages.timeseries import burst_windows
    obs = ray.data.from_arrow(_empty([("subj", pa.string()),
                                      ("pred", pa.string()),
                                      ("obj", pa.string()),
                                      ("ts", pa.int64())]))
    assert validity_intervals(obs).count() == 0
    ev = ray.data.from_arrow(_empty([("event_type", pa.string()),
                                     ("ts", pa.timestamp("us"))]))
    assert burst_windows(ev).count() == 0


def test_webtables_null_html_and_odd_blocking(ray_session):
    import ray.data
    from aida_ray.stages.webtables import html_table_triples, jsonld_triples
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "html": pa.array([None, b"", b"<p>x</p>"])})
    ds = ray.data.from_arrow(t).repartition(3)
    assert html_table_triples(ds).count() == 0
    assert jsonld_triples(ds).count() == 0


def test_rdfs_no_hierarchy(ray_session):
    import ray.data
    from aida_ray.stages.kgqa import rdfs_type_entailment
    types = ray.data.from_arrow(pa.table({
        "entity": pa.array(["a"], pa.string()),
        "cls": pa.array([1], pa.int64())}))
    sub = ray.data.from_arrow(_empty([("child", pa.int64()),
                                      ("parent", pa.int64())]))
    out = rdfs_type_entailment(types, sub).to_pandas()
    assert [tuple(r) for r in out.itertuples(index=False)] == [("a", 1)]


def test_bigram_pmi_below_min_count(ray_session):
    import ray.data
    from aida_ray.stages.lm import bigram_pmi
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["one two three"], pa.string())}))
    out = bigram_pmi(ds, min_count=5, k=3)
    assert out.num_rows == 0
