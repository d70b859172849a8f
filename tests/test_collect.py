"""Hardened block collection (state/collect.py) — regression tests for
the round-2 `contamination` crash: groupby over a small/empty split can
emit schema-less (even raw pandas) empty blocks, and every driver-side
gather must survive them."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from aida_ray.state.collect import collect_table, concat_blocks


def test_concat_blocks_all_empty_schema_less():
    schema = pa.schema([("g", pa.int64())])
    out = concat_blocks([pa.table({})], schema)
    assert out.schema == schema and out.num_rows == 0


def test_concat_blocks_pandas_and_mixed():
    schema = pa.schema([("g", pa.int64())])
    tabs = [pd.DataFrame({"g": []}),                 # raw pandas leak
            pa.table({}),                            # schema-less empty
            pa.table({"g": pa.array([3, 1], pa.int64())})]
    out = concat_blocks(tabs, schema)
    assert out["g"].to_pylist() == [3, 1]


def test_concat_blocks_wrong_empty_schema_normalized():
    schema = pa.schema([("g", pa.int64())])
    out = concat_blocks([pa.table({"other": pa.array([], pa.int64())})],
                        schema)
    assert out.column_names == ["g"]


def test_concat_blocks_no_blocks():
    schema = pa.schema([("g", pa.int64()), ("df", pa.int64())])
    out = concat_blocks([], schema)
    assert out.schema == schema and out.num_rows == 0
    assert concat_blocks([]).num_rows == 0


def test_collect_table_empty_groupby_output(ray_session):
    import ray
    ds = ray.data.from_arrow(pa.table({"g": pa.array([], pa.int64())}))
    agg = ds.groupby("g").count()
    out = collect_table(agg, schema=pa.schema(
        [("g", pa.int64()), ("count()", pa.int64())]))
    assert out.num_rows == 0 and "g" in out.column_names


def test_contamination_empty_eval_split(ray_session):
    """The exact round-2 failure: eval split empty -> eval_gram_ref must
    return an empty gram set, and scoring must report zero hits."""
    import ray
    from aida_ray.stages.contamination import (contamination_counts,
                                               eval_gram_ref)
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["alpha beta gamma delta", "one two three four"])}))
    empty = docs.filter(expr="doc_id > 100")
    ev = eval_gram_ref(empty, n=3)
    assert len(ray.get(ev)) == 0
    out = contamination_counts(docs, ev, n=3).to_pandas()
    assert len(out) == 2
    assert (out["n_contaminated"] == 0).all()
    assert (out["rate"] == 0.0).all()


def test_repeated_spans_no_shared(ray_session):
    """All-distinct corpus: the shared-gram groupby output is empty —
    must not crash, every doc reports n_shared == 0."""
    import ray
    from aida_ray.stages.contamination import repeated_spans
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["aa bb cc dd ee", "ff gg hh ii jj"])}))
    out = repeated_spans(docs, n=3, min_docs=2).to_pandas()
    assert len(out) == 2
    assert (out["n_shared"] == 0).all()


def test_knn_as_matrix_zero_copy_paths():
    from aida_ray.stages.knn import _as_matrix
    m = np.arange(12, dtype=np.float64).reshape(4, 3)
    # plain list column
    col = pa.array([list(r) for r in m], pa.list_(pa.float64()))
    np.testing.assert_array_equal(_as_matrix(col), m)
    # chunked
    ch = pa.chunked_array([col.slice(0, 2), col.slice(2, 2)])
    np.testing.assert_array_equal(_as_matrix(ch), m)
    # fixed-size list
    fsl = pa.FixedSizeListArray.from_arrays(
        pa.array(m.ravel(), pa.float64()), 3)
    np.testing.assert_array_equal(_as_matrix(fsl), m)
    # ragged falls back to pylist path
    rag = pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float64()))
    with pytest.raises(ValueError):
        _as_matrix(rag)
