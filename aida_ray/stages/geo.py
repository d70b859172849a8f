"""Geo enrichment: nearest-site assignment.

Assign every point (a geotagged page, an extracted place mention) to
its nearest reference site (cities, datacenters, admin centroids) —
the spatial-join step of location normalization.  Distance is
squared planar distance on integer grid coordinates (exact int64
arithmetic — the equirectangular shortcut; swap in haversine when
coordinates are real degrees and a float tolerance is acceptable).
Ties break on the smaller site id.

Scale shape: the site table is broadcast once via ``ray.put``
(reference gazetteers are dictionary-sized); each batch computes the
full point x site distance matrix VECTORIZED (numpy broadcasting)
and argmins — no shuffle.  For gazetteers too large to broadcast,
pre-bucket sites into a coarse grid and probe only neighboring cells
(the IVF pattern of stages/knn.py applied to 2-D).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def nearest_site(points: ray.data.Dataset, sites: pa.Table,
                 x: str = "x", y: str = "y",
                 site_id: str = "site", sx: str = "x",
                 sy: str = "y") -> ray.data.Dataset:
    """Append (site, d2) to each point row: the nearest site by
    squared distance (int64-exact), ties to the smaller site id."""
    ids = sites[site_id].to_numpy(zero_copy_only=False).astype(
        np.int64)
    order = np.argsort(ids, kind="stable")   # tie-break = smaller id
    ref = ray.put((ids[order],
                   sites[sx].to_numpy(zero_copy_only=False).astype(
                       np.int64)[order],
                   sites[sy].to_numpy(zero_copy_only=False).astype(
                       np.int64)[order]))

    def batch(b: pa.Table) -> pa.Table:
        from aida_ray.stages.dedup import _get_cached
        sid, sxv, syv = _get_cached(ref)
        px = b[x].to_numpy(zero_copy_only=False).astype(np.int64)
        py = b[y].to_numpy(zero_copy_only=False).astype(np.int64)
        dx = px[:, None] - sxv[None, :]
        dy = py[:, None] - syv[None, :]
        d2 = dx * dx + dy * dy
        j = np.argmin(d2, axis=1)      # first minimum = smallest id
        return b.append_column(
            "site", pa.array(sid[j], pa.int64())).append_column(
            "d2", pa.array(d2[np.arange(len(px)), j], pa.int64()))

    return points.map_batches(batch, batch_format="pyarrow")


_COORD_PATTERN = r"(?P<lat>\d{1,2})n (?P<lon>\d{1,3})e"


def extract_coords(docs: ray.data.Dataset, id_col: str = "doc_id",
                   text_col: str = "text") -> ray.data.Dataset:
    """(doc_id, x, y) for each document whose text carries a grid
    coordinate mention ("<lat>n <lon>e", first match wins) — the
    location-normalization front half feeding :func:`nearest_site`.
    Fully vectorized: ONE Arrow RE2 ``pc.extract_regex`` kernel, no
    Python per row; coordinate-free docs emit no row."""
    import pyarrow.compute as pc

    def batch(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b[text_col].combine_chunks(),
                             pattern=_COORD_PATTERN)
        keep = pc.is_valid(m)
        ids = pc.filter(b[id_col].combine_chunks(), keep)
        hit = pc.filter(m, keep)
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "x": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64())})
        return pa.table({
            id_col: pc.cast(ids, pa.int64()),
            "x": pc.cast(hit.field("lat"), pa.int64()),
            "y": pc.cast(hit.field("lon"), pa.int64())})

    return docs.map_batches(batch, batch_format="pyarrow")
