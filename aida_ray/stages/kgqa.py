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


def rdfs_type_entailment(types: ray.data.Dataset,
                         subclass: ray.data.Dataset,
                         ent_col: str = "entity", cls_col: str = "cls",
                         child: str = "child", parent: str = "parent",
                         broadcast_rows: int = 4_000_000
                         ) -> ray.data.Dataset:
    """RDFS subClassOf entailment: every entity typed c is also typed
    every ancestor of c.  Returns DISTINCT (entity, cls) — asserted
    plus inferred.

    The subclass hierarchy is CLASS-vocabulary-sized (thousands of
    rows next to a trillion assertions), so its transitive closure
    (via :func:`aida_ray.stages.graphs.ancestor_closure`, pointer
    doubling) is broadcast once and applied map-side; above the
    broadcast gate a hash join on cls takes over.  The final distinct
    runs over (entity, cls) — bounded by entities x depth, the output
    itself.
    """
    from ray.data.aggregate import Sum

    from aida_ray.stages.graphs import ancestor_closure

    closure = ancestor_closure(subclass, child=child, parent=parent)

    def explode_bcast(anc_ref):
        from aida_ray.stages.dedup import _get_cached

        def fn(b: pa.Table) -> pa.Table:
            anc = _get_cached(anc_ref)          # dict cls -> np ancestors
            cls = b[cls_col].to_numpy(zero_copy_only=False)
            ents = b[ent_col].to_pandas()
            counts = np.fromiter(
                (len(anc.get(int(c), ())) + 1 for c in cls),
                dtype=np.int64, count=len(cls))
            out_ent = np.repeat(ents.to_numpy(), counts)
            out_cls = np.concatenate(
                [np.concatenate(([int(c)], anc.get(int(c), np.array([], dtype=np.int64))))
                 for c in cls]) if len(cls) else np.array([], dtype=np.int64)
            return pa.table({ent_col: pa.array(out_ent, pa.string()),
                             cls_col: pa.array(out_cls, pa.int64()),
                             "one": pa.array(np.ones(len(out_cls),
                                                     dtype=np.int64))})
        return fn

    n_closure = closure.count()
    if n_closure <= broadcast_rows:
        ct = collect_table(closure, schema=pa.schema(
            [("node", pa.int64()), ("anc", pa.int64()),
             ("dist", pa.int64())]))
        node = ct["node"].to_numpy(zero_copy_only=False)
        anc = ct["anc"].to_numpy(zero_copy_only=False)
        amap: dict[int, np.ndarray] = {}
        order = np.argsort(node, kind="stable")
        for k, a in zip(node[order], anc[order]):
            amap.setdefault(int(k), []).append(int(a))
        amap = {k: np.array(v, dtype=np.int64) for k, v in amap.items()}
        ref = ray.put(amap)
        exploded = types.map_batches(explode_bcast(ref),
                                     batch_format="pyarrow")
    else:
        from aida_ray.stages.shuffle_join import hash_join

        anc_side = closure.map_batches(
            lambda b: pa.table({"jcls": b["node"], "janc": b["anc"]}),
            batch_format="pyarrow")
        joined = hash_join(types, anc_side, on=(cls_col,),
                           right_on=("jcls",), join_type="left_outer")

        def unfold(b: pa.Table) -> pa.Table:
            ents = b[ent_col].to_pandas()
            cls = b[cls_col].to_numpy(zero_copy_only=False)
            janc = b["janc"].to_numpy(zero_copy_only=False)
            have = ~pa.compute.is_null(b["janc"]).to_numpy(
                zero_copy_only=False)
            out_ent = np.concatenate([ents.to_numpy(),
                                      ents.to_numpy()[have]])
            out_cls = np.concatenate([
                cls.astype(np.int64),
                np.nan_to_num(janc[have].astype("float64")).astype(
                    np.int64)])
            return pa.table({ent_col: pa.array(out_ent, pa.string()),
                             cls_col: pa.array(out_cls, pa.int64()),
                             "one": pa.array(np.ones(len(out_cls),
                                                     dtype=np.int64))})

        exploded = joined.map_batches(unfold, batch_format="pyarrow")

    distinct = exploded.groupby([ent_col, cls_col]).aggregate(Sum("one"))
    return distinct.map_batches(
        lambda b: pa.table({ent_col: b[ent_col],
                            cls_col: pc.cast(b[cls_col], pa.int64())}),
        batch_format="pyarrow")


_KNUTH = 2654435761


def negative_samples(triples: ray.data.Dataset, entities: list[str],
                     id_col: str = "ex_id", s: str = "subj",
                     p: str = "pred", o: str = "obj",
                     k: int = 1) -> ray.data.Dataset:
    """Deterministic object-corruption negatives for KG-embedding
    training (the uniform negative sampling of TransE et al., made
    reproducible): example ``id`` draws replacement index
    ``(id * 2654435761 + j) % |E|`` (Knuth multiplicative hash) for
    j < k; a draw that hits the TRUE object shifts to the next index,
    so every negative is guaranteed false under the closed registry.

    The registry rides by closure (dictionary-sized next to the
    assertion stream — the same broadcast judgement as
    :func:`dangling_objects`); the stage is a stateless map, output
    k rows per positive with ``label = 0``.
    """
    ents = np.asarray(entities)
    n = len(ents)
    if n < 2:
        raise ValueError("need at least 2 registry entities to corrupt")

    def batch(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # keep id * KNUTH inside int64 — numpy would wrap silently
        # where a SQL twin errors (the zscore-overflow lesson)
        assert ids.size == 0 or abs(ids).max() < (1 << 31), \
            "example ids must fit 31 bits; pre-bucket larger id spaces"
        objs = b[o].to_pandas().to_numpy()
        parts = []
        for j in range(k):
            idx = (ids * _KNUTH + j) % n
            neg = ents[idx]
            hit = neg == objs
            idx = np.where(hit, (idx + 1) % n, idx)
            neg = ents[idx]
            parts.append(pa.table({
                id_col: pa.array(ids, pa.int64()),
                s: b[s], p: b[p],
                "neg_obj": pa.array(neg, pa.string()),
                "j": pa.array(np.full(len(ids), j, dtype=np.int64)),
                "label": pa.array(np.zeros(len(ids), dtype=np.int64))}))
        return pa.concat_tables(parts)

    return triples.map_batches(batch, batch_format="pyarrow")


def fact_verdicts(extractions: ray.data.Dataset, kb: pa.Table,
                  functional_preds: list[str], s: str = "subj",
                  p: str = "pred", o: str = "obj") -> ray.data.Dataset:
    """Verify extracted triples against a trusted KB: verdict =
    'supported' (exact (s, p, o) match), 'contradicted' (the KB
    asserts a DIFFERENT object for the same (s, p) slot of a
    FUNCTIONAL predicate), else 'novel' — the claim-verification
    triage a fusion pipeline runs before admitting web extractions.

    The KB is broadcast once via ``ray.put`` (trusted cores are
    registry-sized next to the extraction stream); each batch checks
    set membership vectorized over packed keys — no shuffle."""
    from aida_ray.stages.dedup import _get_cached

    funcs = set(functional_preds)
    facts = set()
    slots: dict[tuple[str, str], str] = {}
    for ks, kp, ko in zip(kb[s].to_pylist(), kb[p].to_pylist(),
                          kb[o].to_pylist()):
        facts.add((ks, kp, ko))
        if kp in funcs:
            slots[(ks, kp)] = ko
    ref = ray.put((facts, slots))

    def batch(b: pa.Table) -> pa.Table:
        fset, fslots = _get_cached(ref)
        verdicts = []
        for es, ep, eo in zip(b[s].to_pylist(), b[p].to_pylist(),
                              b[o].to_pylist()):
            if (es, ep, eo) in fset:
                verdicts.append("supported")
            elif (es, ep) in fslots and fslots[(es, ep)] != eo:
                verdicts.append("contradicted")
            else:
                verdicts.append("novel")
        return b.append_column("verdict",
                               pa.array(verdicts, pa.string()))

    return extractions.map_batches(batch, batch_format="pyarrow")


def confidence_calibration(verdicted: ray.data.Dataset,
                           conf_col: str = "fused",
                           verdict_col: str = "verdict",
                           bins: int = 10) -> ray.data.Dataset:
    """Reliability table for fused triple confidences: (bin, n,
    n_supported, accuracy) with bin = floor(conf * bins) clamped to
    bins-1 — the calibration check run before thresholding web
    extractions for KB admission (is a 0.8-confidence triple right
    ~80% of the time against the trusted core?).

    Scale shape: per-block (bin, verdict) count partials + one
    bins-bounded groupby-sum; accuracy = supported / n rounded to 6.
    Callers must keep planted confidences away from bin edges — the
    floor of a float product is the one place engine ulp differences
    could diverge."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        c = b[conf_col].to_numpy(zero_copy_only=False)
        bn = np.minimum((c * bins).astype("int64"), bins - 1)
        sup = (np.asarray(b[verdict_col].to_pylist()) == "supported")
        df = pd.DataFrame({"bin": bn, "n": 1,
                           "sup": sup.astype("int64")})
        g = df.groupby("bin", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = verdicted.map_batches(partial, batch_format="pyarrow") \
        .groupby("bin").aggregate(Sum("n"), Sum("sup"))

    def finish(b: pa.Table) -> pa.Table:
        import numpy as np
        n = b["sum(n)"].to_numpy(zero_copy_only=False)
        s = b["sum(sup)"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bin": b["bin"],
            "n": pa.array(n, pa.int64()),
            "n_supported": pa.array(s, pa.int64()),
            "accuracy": pa.array(np.round(s / n, 6), pa.float64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def domain_range_violations(triples: ray.data.Dataset,
                            types: ray.data.Dataset,
                            schema: dict[str, tuple[str, str]],
                            s: str = "subj", p: str = "pred",
                            o: str = "obj", ent_col: str = "entity",
                            type_col: str = "type"
                            ) -> ray.data.Dataset:
    """RDFS domain/range checking: triples whose subject type differs
    from the predicate's declared DOMAIN or whose object type differs
    from its declared RANGE — the schema-level integrity check next
    to functional_violations (cardinality) and dangling_objects
    (referential).

    ``schema`` maps pred -> (domain_type, range_type); predicates
    absent from the schema are unchecked.  Entities missing from the
    type registry type as 'unknown' (consistent with
    predicate_signatures) and DO violate a declared constraint.

    Emits violating rows (subj, pred, obj, why) with
    why in {'domain', 'range', 'both'}.

    Scale shape: registry + schema broadcast once (entity/predicate
    vocabulary bounded); the check is one stateless scan — no
    shuffle at all."""
    from aida_ray.stages.dedup import _get_cached
    from aida_ray.state.collect import collect_table

    reg = collect_table(types, schema=pa.schema(
        [(ent_col, pa.string()), (type_col, pa.string())]))
    ref = ray.put((dict(zip(reg[ent_col].to_pylist(),
                            reg[type_col].to_pylist())), dict(schema)))

    def check(b: pa.Table) -> pa.Table:
        tmap, sch = _get_cached(ref)
        sv = b[s].to_pylist()
        pv = b[p].to_pylist()
        ov = b[o].to_pylist()
        rs, rp, ro, why = [], [], [], []
        for su, pr, ob in zip(sv, pv, ov):
            decl = sch.get(pr)
            if decl is None:
                continue
            bad_d = tmap.get(su, "unknown") != decl[0]
            bad_r = tmap.get(ob, "unknown") != decl[1]
            if bad_d or bad_r:
                rs.append(su)
                rp.append(pr)
                ro.append(ob)
                why.append("both" if bad_d and bad_r
                           else ("domain" if bad_d else "range"))
        return pa.table({s: pa.array(rs, pa.string()),
                         p: pa.array(rp, pa.string()),
                         o: pa.array(ro, pa.string()),
                         "why": pa.array(why, pa.string())})

    return triples.map_batches(check, batch_format="pyarrow")


def sameas_rewrite(triples: ray.data.Dataset, sameas: ray.data.Dataset,
                   s: str = "subj", p: str = "pred", o: str = "obj",
                   a_col: str = "a", b_col: str = "b",
                   broadcast_nodes: int = 8_000_000
                   ) -> ray.data.Dataset:
    """owl:sameAs canonicalization: cluster the sameAs graph
    (graphs.string_components — rep = min string), rewrite every
    triple's subject and object to its cluster representative
    (identity for entities outside the graph), and collapse to
    distinct rewritten triples with the merged source count — THE
    entity-merge step that turns per-source ids into one canonical
    KG.

    Emits (subj, pred, obj, n_src) where n_src counts DISTINCT
    source triples that collapsed into the row.

    Scale shape: the rep map is sameAs-graph bounded (alias
    vocabulary, broadcast under ``broadcast_nodes`` — the same gate
    as the CC front-end); rewriting is one stateless scan with two
    sorted-array lookups; the final distinct+count is one groupby
    bounded by distinct rewritten triples."""
    from ray.data.aggregate import Sum

    from aida_ray.stages.dedup import _get_cached
    from aida_ray.stages.graphs import string_components

    cc = collect_table(string_components(
        sameas, a_col=a_col, b_col=b_col,
        broadcast_nodes=broadcast_nodes),
        schema=pa.schema([("node", pa.string()),
                          ("rep", pa.string())]))
    nodes = cc["node"].to_numpy(zero_copy_only=False).astype(str)
    reps = cc["rep"].to_numpy(zero_copy_only=False).astype(str)
    order = np.argsort(nodes, kind="stable")
    ref = ray.put((nodes[order], reps[order]))

    # global distinct of SOURCE triples first (a source triple may
    # repeat across blocks; per-batch dedup alone would double-count)
    def distinct_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({s: b[s].to_pandas(), p: b[p].to_pandas(),
                           o: b[o].to_pandas()}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    distinct = triples.map_batches(distinct_partial,
                                   batch_format="pyarrow") \
        .groupby([s, p, o]).count().select_columns([s, p, o])

    def rewrite(b: pa.Table) -> pa.Table:
        ns, rs = _get_cached(ref)
        if s not in b.column_names:
            return pa.table({s: pa.array([], pa.string()),
                             p: pa.array([], pa.string()),
                             o: pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})

        def to_rep(col: np.ndarray) -> np.ndarray:
            if len(ns) == 0:
                return col
            idx = np.clip(np.searchsorted(ns, col), 0, len(ns) - 1)
            hit = ns[idx] == col
            return np.where(hit, rs[idx], col)

        df = pd.DataFrame({
            s: to_rep(b[s].to_numpy(zero_copy_only=False).astype(str)),
            p: b[p].to_pandas(),
            o: to_rep(b[o].to_numpy(zero_copy_only=False).astype(str))})
        g = df.groupby([s, p, o], sort=False).size() \
            .rename("n").reset_index()
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = distinct.map_batches(rewrite, batch_format="pyarrow") \
        .groupby([s, p, o]).aggregate(Sum("n"))

    def finish(b: pa.Table) -> pa.Table:
        if "sum(n)" not in b.column_names:
            return pa.table({s: pa.array([], pa.string()),
                             p: pa.array([], pa.string()),
                             o: pa.array([], pa.string()),
                             "n_src": pa.array([], pa.int64())})
        return pa.table({s: b[s], p: b[p], o: b[o],
                         "n_src": b["sum(n)"].cast(pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")
