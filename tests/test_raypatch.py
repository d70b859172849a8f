"""Regression tests for the hash-shuffle schema-broadcast fix
(aida_ray/state/raypatch.py).

Without the patch, a Dataset.join whose first block on either side is
EMPTY deterministically crashes JoinAggregator.finalize with
``ArrowInvalid: No match ... FieldRef`` on any partition that receives
zero rows — Ray consumes its one schema-broadcast opportunity on the
empty block.  These tests pin the repro green under the patch."""

import pyarrow as pa
import pytest


def _tbl(node_color):
    return pa.table({"node": pa.array([p[0] for p in node_color], pa.int64()),
                     "color": pa.array([p[1] for p in node_color], pa.int64())})


def _rtbl(node_color):
    return pa.table({"cnode": pa.array([p[0] for p in node_color], pa.int64()),
                     "ccolor": pa.array([p[1] for p in node_color], pa.int64())})


@pytest.mark.parametrize("left_empty_first,right_empty_first", [
    (True, False), (False, True), (True, True),
])
def test_join_with_empty_first_block(ray_session, left_empty_first,
                                     right_empty_first):
    from aida_ray.state import raypatch
    assert raypatch.install()

    import ray.data
    data = _tbl([(1, 1), (2, 2), (3, 3)])
    rdata = _rtbl([(1, 1), (2, 1), (3, 2)])
    ltabs = ([_tbl([])] if left_empty_first else []) + [data]
    rtabs = ([_rtbl([])] if right_empty_first else []) + [rdata]
    j = ray.data.from_arrow(ltabs).join(
        ray.data.from_arrow(rtabs), join_type="inner", num_partitions=4,
        on=("color",), right_on=("cnode",))
    out = j.to_pandas().sort_values(["node", "ccolor"]).reset_index(drop=True)
    assert list(out["node"]) == [1, 2, 3]
    assert list(out["ccolor"]) == [1, 1, 2]


def test_join_interleaved_empty_blocks(ray_session):
    """Several empty blocks scattered through both sides."""
    from aida_ray.state import raypatch
    assert raypatch.install()

    import ray.data
    lt = [_tbl([]), _tbl([(1, 10)]), _tbl([]), _tbl([(2, 20)]), _tbl([])]
    rt = [_rtbl([]), _rtbl([(10, 7)]), _rtbl([]), _rtbl([(20, 8)])]
    j = ray.data.from_arrow(lt).join(
        ray.data.from_arrow(rt), join_type="inner", num_partitions=8,
        on=("color",), right_on=("cnode",))
    out = j.to_pandas().sort_values("node").reset_index(drop=True)
    assert list(out["node"]) == [1, 2]
    assert list(out["ccolor"]) == [7, 8]
