"""Anchor-statistics prior dictionary (stages/links.py:anchor_priors):
the G1 sum-to-1 invariant, route equality, extraction edge cases."""

import numpy as np
import pyarrow as pa

import ray.data

from aida_ray.stages.links import anchor_priors, anchor_surface_pairs


def _pages(htmls):
    return ray.data.from_arrow(pa.table({
        "html": pa.array(htmls, pa.binary())}))


def test_pair_extraction_normalizes_surface(ray_session):
    out = anchor_surface_pairs(_pages([
        b'<a href="E1"> Obama </a><a class="x" href="E2">OBAMA</a>',
        b'<a href="E1"></a>no anchors here',
        None,
    ])).to_pandas()
    assert sorted(zip(out.surface, out.target)) == [
        ("obama", "E1"), ("obama", "E2")]


def test_priors_sum_to_one_per_surface(ray_session):
    htmls = [(f'<a href="E{i % 3}">s{i % 2}</a>'
              f'<a href="E{(i + 1) % 3}">s{i % 2}</a>').encode()
             for i in range(20)]
    out = anchor_priors(_pages(htmls)).to_pandas()
    sums = out.groupby("surface")["prior"].sum()
    assert np.allclose(sums.to_numpy(), 1.0)
    # n is the exact pair count: 20 pages x 2 anchors
    assert out.n.sum() == 40


def test_routes_agree(ray_session):
    rng = np.random.default_rng(3)
    htmls = []
    for i in range(30):
        parts = "".join(
            f'<a href="E{int(rng.integers(0, 5))}">'
            f's{int(rng.integers(0, 4))}</a>'
            for _ in range(int(rng.integers(0, 5))))
        htmls.append(f"<html>{parts}</html>".encode())
    bc = anchor_priors(_pages(htmls)).to_pandas() \
        .sort_values(["surface", "target"]).reset_index(drop=True)
    hj = anchor_priors(_pages(htmls), broadcast_rows=0).to_pandas() \
        .sort_values(["surface", "target"]).reset_index(drop=True)
    assert list(bc.surface) == list(hj.surface)
    assert list(bc.target) == list(hj.target)
    assert list(bc.n) == list(hj.n)
    assert np.allclose(bc.prior, hj.prior)


def test_no_anchors(ray_session):
    out = anchor_priors(_pages([b"<html><p>plain</p></html>"])) \
        .to_pandas()
    assert len(out) == 0
