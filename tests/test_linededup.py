"""Line-level dedup (stages/linededup.py): planted-boilerplate
semantics, broadcast/anti-join route equality, edge shapes."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from aida_ray.stages.linededup import line_dedup


def _docs(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string())}))


BOILER = "cookie notice accept all terms apply"          # 6 tokens


def test_planted_boilerplate_removed(ray_session):
    rows = [
        (0, BOILER + " alpha beta gamma delta eps zeta"),
        (1, BOILER + " one two three four five six"),
        (2, "unique doc with its very own tokens here padded out fully"),
    ]
    out = line_dedup(_docs(rows), tokens_per_line=6, min_count=2) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out.n_lines) == [2, 2, 2]
    assert list(out.kept_lines) == [1, 1, 2]
    assert out.text_out[0] == "alpha beta gamma delta eps zeta"
    assert out.text_out[1] == "one two three four five six"
    assert out.text_out[2] == rows[2][1]


def test_all_boilerplate_doc_kept_empty(ray_session):
    rows = [(0, BOILER), (1, BOILER), (2, "a b c d e f")]
    out = line_dedup(_docs(rows), tokens_per_line=6, min_count=2) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out.kept_lines) == [0, 0, 1]
    assert out.text_out[0] == "" and out.text_out[1] == ""


def test_short_tail_line_and_min_count(ray_session):
    # 8 tokens -> one 6-token line + one 2-token tail; min_count=3 so
    # a line needs three occurrences to be dropped
    t8 = BOILER + " tail bit"
    rows = [(i, t8) for i in range(3)] + [(3, "solo text " + "x " * 5)]
    out = line_dedup(_docs(rows), tokens_per_line=6, min_count=3) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out.n_lines) == [2, 2, 2, 2]
    assert list(out.kept_lines) == [0, 0, 0, 2]


def test_routes_agree(ray_session):
    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    rows = []
    for i in range(40):
        toks = list(rng.choice(vocab, size=int(rng.integers(7, 30))))
        if i % 3 == 0:
            toks = BOILER.split() + toks      # planted shared line
        rows.append((i, " ".join(toks)))
    bc = line_dedup(_docs(rows), tokens_per_line=6, min_count=2) \
        .to_pandas()
    aj = line_dedup(_docs(rows), tokens_per_line=6, min_count=2,
                    broadcast_rows=0).to_pandas()
    bc = bc.sort_values("doc_id").reset_index(drop=True)
    aj = aj.sort_values("doc_id").reset_index(drop=True)
    # the anti-join route drops docs whose every line was boilerplate
    # (documented); restrict equality to docs both routes emit
    bcr = bc[bc.doc_id.isin(set(aj.doc_id))].reset_index(drop=True)
    assert list(bcr.doc_id) == list(aj.doc_id)
    assert list(bcr.n_lines) == list(aj.n_lines)
    assert list(bcr.kept_lines) == list(aj.kept_lines)
    assert list(bcr.text_out) == list(aj.text_out)
    dropped = set(bc.doc_id) - set(aj.doc_id)
    assert all(bc[bc.doc_id == d].kept_lines.iloc[0] == 0
               for d in dropped)


def test_bucketed_count_route(ray_session):
    rows = [(0, BOILER + " a b c d e f"), (1, BOILER + " g h i j k l")]
    out = line_dedup(_docs(rows), tokens_per_line=6, min_count=2,
                     task_gate_rows=0) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out.kept_lines) == [1, 1]


def test_no_duplicates_noop(ray_session):
    rows = [(0, "a b c d e f g"), (1, "h i j k l m n")]
    out = line_dedup(_docs(rows), tokens_per_line=6, min_count=2) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out.kept_lines) == [2, 2]
    assert list(out.text_out) == [rows[0][1], rows[1][1]]
