"""Hardened driver-side block collection.

``Dataset.to_arrow_refs()`` has two sharp edges that only show up on
small / oddly-blocked inputs (reference parity note: the Java reference
never hits this class of bug because it has no block abstraction —
this is purely a Ray Data seam):

- **raw pandas blocks**: empty ``map_groups`` outputs leak through
  groupbys unconverted, so a "block ref" may deserialize to a
  ``pandas.DataFrame``;
- **schema-less empty blocks**: a groupby over an empty split can emit
  a zero-column table, so ``pa.concat_tables`` or ``t["col"]`` on the
  collected result raises (the round-2 `contamination` crash,
  CORRECTNESS_r02).

Every driver-side gather of a *small* dataset in this package goes
through :func:`collect_table` / :func:`concat_blocks` so the guards
live in exactly one place.  Callers that know the expected schema pass
it — empty inputs then come back as ``schema.empty_table()`` and
downstream column access never KeyErrors.
"""

from __future__ import annotations

import pyarrow as pa

import ray


def concat_blocks(tabs, schema: pa.Schema | None = None) -> pa.Table:
    """Robust concat of already-fetched Dataset blocks.

    Coerces pandas blocks, drops zero-row blocks, promotes schemas on
    concat, and falls back to ``schema.empty_table()`` (or any block
    that still carries a schema) when nothing survives.
    """
    tabs = [pa.Table.from_pandas(t, preserve_index=False)
            if not isinstance(t, pa.Table) else t for t in tabs]
    nonempty = [t for t in tabs if t.num_rows > 0]
    if nonempty:
        out = pa.concat_tables(nonempty, promote_options="default")
    else:
        with_schema = [t for t in tabs if t.num_columns > 0]
        if with_schema:
            out = with_schema[0]
        elif schema is not None:
            out = schema.empty_table()
        else:
            out = tabs[0] if tabs else pa.table({})
    if schema is not None and out.num_rows == 0:
        # even a schema-carrying empty block may have the WRONG columns
        # (e.g. pandas round-trip artifacts) — normalize to the expected
        if any(f.name not in out.column_names for f in schema):
            out = schema.empty_table()
    return out


def collect_table(ds: "ray.data.Dataset",
                  schema: pa.Schema | None = None) -> pa.Table:
    """Gather a SMALL dataset (callers gate on row counts / byte
    budgets) to one Arrow table on the driver, guarded per module
    docstring."""
    return concat_blocks([ray.get(r) for r in ds.to_arrow_refs()], schema)
