"""Tests for vectorized regex / flat-JSON extraction."""

import pyarrow as pa

import ray.data as rd


def test_regex_extract_named_groups(ray_session):
    from aida_ray.stages.jsonx import regex_extract
    ds = rd.from_arrow(pa.table({
        "id": [1, 2, 3],
        "s": ["alice@example", "bob@test", "no-at-sign"]}))
    out = regex_extract(ds, "s", r"(?P<user>\w+)@(?P<host>\w+)",
                        keep=("id",)).to_pandas().sort_values("id")
    assert out.user.tolist()[:2] == ["alice", "bob"]
    assert out.host.tolist()[:2] == ["example", "test"]
    assert out.user.isna().tolist() == [False, False, True]


def test_json_int_field_negative_and_missing(ray_session):
    from aida_ray.stages.jsonx import json_int_field
    ds = rd.from_arrow(pa.table({
        "id": [1, 2, 3],
        "props": ['{"k": -7, "z": 1}', '{"z": 2}', '{"k": 40}']}))
    out = json_int_field(ds, "props", "k", keep=("id",)).to_pandas() \
        .sort_values("id")
    assert out.k.tolist()[0] == -7
    assert out.k.isna().tolist() == [False, True, False]
    assert out.k.tolist()[2] == 40
