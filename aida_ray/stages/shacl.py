"""SHACL-lite shape validation over (subj, pred, obj) triple tables.

A shape constrains one (class, property) pair: cardinality
(``min_count`` / ``max_count``), node kind (``datatype`` in
{``any``, ``iri``, ``string``, ``integer``}) and an RE2 ``pattern``
over literal values — the useful core of W3C SHACL for KG publish
gates (schema.org feeds, KB ingestion QA) without the RDF graph
machinery.

Scale shape:

- the shape registry is tiny and broadcast once; the entity→class map
  is ENTITY-BOUNDED state broadcast via ``ray.put`` (the same
  assumption the NED stack makes for its entity metadata — swap for a
  hash join of triples against the types table when the entity space
  outgrows a broadcast blob; the plan is otherwise unchanged).
- value-level checks (datatype, pattern) are MAP-ONLY over the triple
  stream — vectorized pandas merges against the shape frame, one
  compiled-regex match per DISTINCT pattern; per-entity violation
  dedup rides the small violation shuffle.
- cardinality checks need per-(entity, prop) counts INCLUDING zero:
  each triple batch emits count partials, each typed entity emits a
  zero row for every shaped property of its class (fan-out = entities
  x shaped-props, bounded by the shape registry), one groupby-sum
  merges both — shuffle volume tracks entity x shaped-prop, never the
  triple count.

Returns one row per (entity, prop, kind); kind in {min_count,
max_count, datatype, pattern}.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from aida_ray.stages.dedup import _get_cached

_INT_RE = r"^-?[0-9]+$"

_EMPTY = pa.table({"entity": pa.array([], pa.string()),
                   "prop": pa.array([], pa.string()),
                   "kind": pa.array([], pa.string())})


def _viol_table(df: pd.DataFrame) -> pa.Table:
    if not len(df):
        return _EMPTY
    return pa.table({
        "entity": pa.array(df.entity.astype(str), pa.string()),
        "prop": pa.array(df.prop.astype(str), pa.string()),
        "kind": pa.array(df.kind.astype(str), pa.string())})


def validate_shapes(types: ray.data.Dataset, triples: ray.data.Dataset,
                    shapes: pa.Table) -> ray.data.Dataset:
    """``types``: (entity, cls); ``triples``: (subj, pred, obj,
    is_literal); ``shapes``: (cls, prop, min_count, max_count,
    datatype, pattern) with nullable max_count/pattern."""
    from ray.data.aggregate import Sum

    sh = shapes.to_pandas()
    tp = types.to_pandas()            # entity-bounded
    cls_map = dict(zip(tp.entity, tp.cls))
    bc = ray.put((sh, cls_map))

    def _merged(b: pa.Table, shf: pd.DataFrame,
                cmap: dict) -> pd.DataFrame:
        df = pd.DataFrame({"entity": b["subj"].to_pandas(),
                           "prop": b["pred"].to_pandas(),
                           "obj": b["obj"].to_pandas(),
                           "lit": b["is_literal"].to_numpy(
                               zero_copy_only=False).astype(bool)})
        df["cls"] = df.entity.map(cmap)
        return df.merge(shf, left_on=["cls", "prop"],
                        right_on=["cls", "prop"], how="inner")

    def value_checks(b: pa.Table) -> pa.Table:
        shf, cmap = _get_cached(bc)
        m = _merged(b, shf, cmap)
        if not len(m):
            return _EMPTY
        dt = m.datatype
        is_int = m.obj.str.match(_INT_RE)
        bad_dt = (((dt == "iri") & m.lit)
                  | ((dt == "string") & ~m.lit)
                  | ((dt == "integer") & (~m.lit | ~is_int)))
        out = [m[bad_dt][["entity", "prop"]].assign(kind="datatype")]
        pats = m.pattern.dropna().unique()
        for pat in pats:
            sel = (m.pattern == pat) & m.lit
            bad = sel & ~m.obj.str.match(pat)
            out.append(m[bad][["entity", "prop"]].assign(kind="pattern"))
        res = pd.concat(out).drop_duplicates()
        return _viol_table(res)

    value_viol = triples.map_batches(value_checks,
                                     batch_format="pyarrow") \
        .groupby(["entity", "prop", "kind"]).count() \
        .select_columns(["entity", "prop", "kind"])

    def count_partial(b: pa.Table) -> pa.Table:
        shf, cmap = _get_cached(bc)
        m = _merged(b, shf, cmap)
        g = m.groupby(["entity", "prop"], sort=False).size() \
            .rename("n").reset_index()
        return pa.table({
            "entity": pa.array(g.entity.astype(str), pa.string()),
            "prop": pa.array(g.prop.astype(str), pa.string()),
            "n": pa.array(g.n.to_numpy("int64"))})

    def zero_rows(b: pa.Table) -> pa.Table:
        shf, _ = _get_cached(bc)
        df = pd.DataFrame({"entity": b["entity"].to_pandas(),
                           "cls": b["cls"].to_pandas()})
        m = df.merge(shf[["cls", "prop"]], on="cls", how="inner")
        return pa.table({
            "entity": pa.array(m.entity.astype(str), pa.string()),
            "prop": pa.array(m.prop.astype(str), pa.string()),
            "n": pa.array(np.zeros(len(m), "int64"))})

    counts = triples.map_batches(count_partial, batch_format="pyarrow") \
        .union(types.map_batches(zero_rows, batch_format="pyarrow")) \
        .groupby(["entity", "prop"]).aggregate(Sum("n"))

    def card_checks(b: pa.Table) -> pa.Table:
        shf, cmap = _get_cached(bc)
        df = pd.DataFrame({"entity": b["entity"].to_pandas(),
                           "prop": b["prop"].to_pandas(),
                           "n": b["sum(n)"].to_numpy(
                               zero_copy_only=False).astype("int64")})
        df["cls"] = df.entity.map(cmap)
        m = df.merge(shf, on=["cls", "prop"], how="inner")
        if not len(m):
            return _EMPTY
        out = [m[m.n < m.min_count][["entity", "prop"]]
               .assign(kind="min_count"),
               m[m.max_count.notna()
                 & (m.n > m.max_count.fillna(np.inf))][["entity",
                                                        "prop"]]
               .assign(kind="max_count")]
        return _viol_table(pd.concat(out))

    card_viol = counts.map_batches(card_checks, batch_format="pyarrow")
    return value_viol.union(card_viol)
