"""KG data-quality checks over a (subj, pred, obj) triple table.

Two classic integrity constraints (the checks a YAGO/DBpedia-style
build runs before publishing — public methodology, e.g. the SHACL
cardinality / referential constraint families):

- :func:`functional_violations` — a FUNCTIONAL predicate (bornIn,
  capitalOf, ...) allows at most one object per subject; emit the
  (subj, pred) pairs asserting more than one distinct object.
- :func:`dangling_objects` — objects of entity-valued predicates must
  exist in the entity registry; emit missing objects with their
  reference counts.

Scale shape:

- functional: per-batch (subj, pred, obj) dedup collapses each block
  to its distinct assertions, one groupby over DISTINCT triples (not
  the assertion stream) counts objects per (subj, pred); the second
  aggregate is violation-bounded.
- dangling: the registry is broadcast once via ``ray.put`` when it
  fits (entity registries are dictionary-sized next to the triple
  stream); above the gate a hash anti-join (left_outer + null filter)
  takes over — the same adaptive pattern as the dedup semi-joins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from aida_ray.state.collect import collect_table


def functional_violations(triples: ray.data.Dataset,
                          functional_preds: list[str],
                          s: str = "subj", p: str = "pred",
                          o: str = "obj") -> ray.data.Dataset:
    """(subj, pred, n_obj) rows where a functional predicate asserts
    n_obj > 1 distinct objects for one subject."""
    from ray.data.aggregate import Sum

    preds = set(functional_preds)

    def distinct_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({s: b[s].to_pandas(), p: b[p].to_pandas(),
                           o: b[o].to_pandas()})
        df = df[df[p].isin(preds)].drop_duplicates()
        df["one"] = np.int64(1)
        return pa.Table.from_pandas(df, preserve_index=False)

    # distinct triples globally (volume = distinct assertions), then
    # count distinct objects per (subj, pred)
    distinct = triples.map_batches(distinct_partial,
                                   batch_format="pyarrow") \
        .groupby([s, p, o]).aggregate(Sum("one"))

    def to_pair(b: pa.Table) -> pa.Table:
        return pa.table({s: b[s], p: b[p],
                         "one": pa.array(
                             np.ones(b.num_rows, dtype=np.int64))})

    counts = distinct.map_batches(to_pair, batch_format="pyarrow") \
        .groupby([s, p]).aggregate(Sum("one"))

    def finish(b: pa.Table) -> pa.Table:
        n = pc.cast(b["sum(one)"], pa.int64())
        t = pa.table({s: b[s], p: b[p], "n_obj": n})
        return t.filter(pc.greater(n, 1))

    return counts.map_batches(finish, batch_format="pyarrow")


def dangling_objects(triples: ray.data.Dataset,
                     entities: ray.data.Dataset, s: str = "subj",
                     p: str = "pred", o: str = "obj",
                     ent_col: str = "entity",
                     broadcast_rows: int = 4_000_000) -> ray.data.Dataset:
    """(obj, n_refs) for objects missing from the entity registry."""
    from ray.data.aggregate import Sum

    n_ent = entities.count()
    if n_ent <= broadcast_rows:
        ent_table = collect_table(
            entities, schema=pa.schema([(ent_col, pa.string())]))
        ent_ref = ray.put(pc.unique(ent_table[ent_col].combine_chunks()))

        from aida_ray.stages.dedup import _get_cached

        def missing_partial(b: pa.Table) -> pa.Table:
            known = _get_cached(ent_ref)
            objs = b[o].combine_chunks()
            miss = pc.invert(pc.is_in(objs, value_set=known))
            kept = objs.filter(miss)
            df = pd.DataFrame({o: kept.to_pandas()})
            g = df.groupby(o, sort=False).size().rename("n").reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        partials = triples.map_batches(missing_partial,
                                       batch_format="pyarrow")
    else:
        # anti-join route: left_outer against the registry, keep nulls
        from aida_ray.stages.shuffle_join import hash_join

        reg = entities.map_batches(
            lambda b: pa.table({
                ent_col: b[ent_col],
                "flag": pa.array(np.ones(b.num_rows, dtype=np.int64))}),
            batch_format="pyarrow")
        joined = hash_join(triples.select_columns([o]), reg, on=(o,),
                           right_on=(ent_col,), join_type="left_outer")

        def anti_partial(b: pa.Table) -> pa.Table:
            miss = pc.is_null(b["flag"])
            kept = b.filter(miss)
            df = pd.DataFrame({o: kept[o].to_pandas()})
            g = df.groupby(o, sort=False).size().rename("n").reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        partials = joined.map_batches(anti_partial, batch_format="pyarrow")

    agg = partials.groupby(o).aggregate(Sum("n"))
    return agg.map_batches(
        lambda b: pa.table({o: b[o],
                            "n_refs": pc.cast(b["sum(n)"], pa.int64())}),
        batch_format="pyarrow")
