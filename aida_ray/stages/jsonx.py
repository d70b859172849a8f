"""Vectorized field extraction from string columns — regex capture
groups and flat-JSON properties.

`pc.extract_regex` is an Arrow RE2 kernel, so both operators are
zero-copy batch transforms with no Python row loop; the JSON path
covers the flat `{"key": value}` property-bag shape (the common
crawl-metadata case).  For nested/escaped JSON, fall back to a
per-row `json.loads` map — deliberately NOT the default, because the
vectorized kernel is ~20× faster on the hot path.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def regex_extract(ds: ray.data.Dataset, col: str, pattern: str,
                  keep: tuple[str, ...] = ()) -> ray.data.Dataset:
    """Extract named capture groups from ``col`` into columns
    (null where the pattern doesn't match).  `pattern` must use
    RE2 named groups, e.g. ``r'(?P<user>\\w+)@(?P<host>\\w+)'``."""
    def ext(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b[col], pattern=pattern)
        cols = {c: b[c] for c in keep}
        for f in m.type:
            cols[f.name] = m.field(f.name) if isinstance(m, pa.StructArray) \
                else pc.struct_field(m, f.name)
        return pa.table(cols)

    return ds.map_batches(ext, batch_format="pyarrow")


def json_int_field(ds: ray.data.Dataset, col: str, field: str,
                   keep: tuple[str, ...] = ()) -> ray.data.Dataset:
    """Extract an integer property from a flat JSON string column as
    int64 (null when absent), fully vectorized."""
    pattern = rf'"{field}"\s*:\s*(?P<{field}>-?\d+)'

    def ext(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b[col], pattern=pattern)
        val = pc.struct_field(m, field) if not isinstance(m, pa.StructArray) \
            else m.field(field)
        cols = {c: b[c] for c in keep}
        cols[field] = pc.cast(val, pa.int64())
        return pa.table(cols)

    return ds.map_batches(ext, batch_format="pyarrow")
