"""KG schema induction + SPARQL-lite basic-graph-pattern matching.

Two query-side consumers of an extracted (subj, pred, obj) table:

- :func:`predicate_signatures` — schema induction: given an
  (entity, type) registry, the dominant (subj_type, obj_type)
  signature per predicate with assertion-weighted support and purity
  (the public "type signature of a relation" statistic used to clean
  web-extracted KGs, e.g. the domain/range induction step of
  PATTY/NELL-style systems).
- :func:`bgp_match` — conjunctive triple-pattern matching (the BGP
  core of SPARQL): patterns are (s, p, o) strings where ``?name``
  marks a variable; facts are set-deduped, then patterns evaluate
  left-to-right, each joined to the running bindings on its shared
  variables.

Scale shape:

- signatures: the type registry is broadcast once via ``ray.put``
  (registries are dictionary-sized next to the triple stream);
  per-block pandas pre-aggregation collapses each block to its
  distinct (pred, st, ot) counts before the one small groupby; the
  winner pick is a |preds|-bounded map_groups.
- bgp: each pattern is a pushed-down filter over the fact stream
  (literal positions prune at the scan); shared-variable joins are
  hash SHUFFLE joins (stages/shuffle_join.hash_join) because both
  sides are fact-sized; patterns must be connected (a disconnected
  pattern would be a cross product — rejected explicitly).
  Deterministic tie-break for signature winners: max support, then
  lexicographic (subj_type, obj_type).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from aida_ray.state.collect import collect_table


def predicate_signatures(triples: ray.data.Dataset,
                         types: ray.data.Dataset,
                         s: str = "subj", p: str = "pred",
                         o: str = "obj", ent_col: str = "entity",
                         type_col: str = "type") -> ray.data.Dataset:
    """One row per predicate: (pred, subj_type, obj_type, support,
    total, purity) for the dominant signature (assertion-weighted;
    entities missing from the registry type as 'unknown')."""
    from ray.data.aggregate import Sum

    from aida_ray.stages.dedup import _get_cached

    reg = collect_table(types, schema=pa.schema(
        [(ent_col, pa.string()), (type_col, pa.string())]))
    type_ref = ray.put(dict(zip(reg[ent_col].to_pylist(),
                                reg[type_col].to_pylist())))

    def partial(b: pa.Table) -> pa.Table:
        tmap = _get_cached(type_ref)
        df = pd.DataFrame({
            "pred": b[p].to_pandas(),
            "subj_type": [tmap.get(x, "unknown")
                          for x in b[s].to_pylist()],
            "obj_type": [tmap.get(x, "unknown")
                         for x in b[o].to_pylist()]})
        g = df.groupby(["pred", "subj_type", "obj_type"],
                       sort=False).size().rename("n").reset_index()
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = triples.map_batches(partial, batch_format="pyarrow") \
        .groupby(["pred", "subj_type", "obj_type"]).aggregate(Sum("n"))

    def winner(df: pd.DataFrame) -> pd.DataFrame:
        total = int(df["sum(n)"].sum())
        df = df.sort_values(["sum(n)", "subj_type", "obj_type"],
                            ascending=[False, True, True])
        top = df.iloc[0]
        support = int(top["sum(n)"])
        return pd.DataFrame({
            "pred": [top["pred"]],
            "subj_type": [top["subj_type"]],
            "obj_type": [top["obj_type"]],
            "support": np.array([support], dtype=np.int64),
            "total": np.array([total], dtype=np.int64),
            "purity": [round(support / total, 6)]})

    return counts.groupby("pred").map_groups(winner,
                                             batch_format="pandas")


def _match_pattern(facts: ray.data.Dataset, pat: tuple[str, str, str],
                   s: str, p: str, o: str) -> tuple[
                       ray.data.Dataset, list[str]]:
    """Filter facts on the pattern's literal positions and project its
    variables (repeated variables within one pattern enforce
    equality)."""
    cols = (s, p, o)
    lits = [(c, v) for c, v in zip(cols, pat) if not v.startswith("?")]
    var_pos: dict[str, list[str]] = {}
    for c, v in zip(cols, pat):
        if v.startswith("?"):
            var_pos.setdefault(v[1:], []).append(c)
    names = list(var_pos)

    def f(b: pa.Table) -> pa.Table:
        for c, v in lits:
            b = b.filter(pc.equal(b[c], v))
        for cs in var_pos.values():
            for extra in cs[1:]:
                b = b.filter(pc.equal(b[cs[0]], b[extra]))
        return pa.table({n: b[var_pos[n][0]] for n in names})

    return facts.map_batches(f, batch_format="pyarrow"), names


def bgp_match(triples: ray.data.Dataset,
              patterns: list[tuple[str, str, str]], s: str = "subj",
              p: str = "pred", o: str = "obj") -> ray.data.Dataset:
    """Bindings Dataset (one column per ``?variable``) satisfying all
    triple patterns over the set-deduped facts.  Patterns after the
    first must share >= 1 variable with the bindings so far."""
    from aida_ray.stages.rules import _distinct_facts
    from aida_ray.stages.shuffle_join import hash_join

    if not patterns:
        raise ValueError("bgp_match needs at least one pattern")
    facts = _distinct_facts(triples, s, p, o)

    bindings, bound = _match_pattern(facts, patterns[0], s, p, o)
    for pat in patterns[1:]:
        step, names = _match_pattern(facts, pat, s, p, o)
        shared = [n for n in names if n in bound]
        if not shared:
            raise ValueError(
                f"pattern {pat} shares no variable with {bound} — "
                "disconnected BGPs (cross products) are not supported")
        bindings = hash_join(bindings, step, on=shared)
        bound = bound + [n for n in names if n not in bound]
    return bindings


def selectional_preference(triples: ray.data.Dataset,
                           types: ray.data.Dataset,
                           s: str = "subj", p: str = "pred",
                           o: str = "obj", ent_col: str = "entity",
                           type_col: str = "type") -> pa.Table:
    """Resnik selectional-preference strength per predicate:
    KL(P(type | pred) || P(type)) over OBJECT argument types — a
    strongly type-selective predicate ("bornIn" → places) scores
    high, a promiscuous one ("relatedTo") near zero.  The argument-
    typing quality signal next to predicate_signatures' dominant-
    signature purity.

    Emits (pred, n_typed, strength) with strength rounded to 6;
    entities missing from the registry type as 'unknown' (consistent
    with predicate_signatures).

    Scale shape: the type registry broadcasts once (entity-vocabulary
    bounded, same as predicate_signatures); per-batch partials
    pre-count (pred, type) so the one shuffle ships a
    vocabulary-bounded table; the KL finish runs over that small
    table (predicates x types rows)."""
    from ray.data.aggregate import Sum

    from aida_ray.stages.dedup import _get_cached

    reg = collect_table(types, schema=pa.schema(
        [(ent_col, pa.string()), (type_col, pa.string())]))
    type_ref = ray.put(dict(zip(reg[ent_col].to_pylist(),
                                reg[type_col].to_pylist())))

    def partial(b: pa.Table) -> pa.Table:
        tmap = _get_cached(type_ref)
        df = pd.DataFrame({
            "pred": b[p].to_pandas(),
            "otype": [tmap.get(x, "unknown")
                      for x in b[o].to_pylist()]})
        g = df.groupby(["pred", "otype"], sort=False).size() \
            .rename("n").reset_index()
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = collect_table(
        triples.map_batches(partial, batch_format="pyarrow")
        .groupby(["pred", "otype"]).aggregate(Sum("n"))).to_pandas()
    if counts.empty:
        return pa.table({"pred": pa.array([], pa.string()),
                         "n_typed": pa.array([], pa.int64()),
                         "strength": pa.array([], pa.float64())})
    n = counts["sum(n)"].to_numpy(dtype="float64")
    total = n.sum()
    prior = counts.groupby("otype")["sum(n)"].sum() / total
    pt = counts["otype"].map(prior).to_numpy(dtype="float64")
    per_pred = counts.groupby("pred")["sum(n)"].sum()
    np_pred = counts["pred"].map(per_pred).to_numpy(dtype="float64")
    cond = n / np_pred
    kl = pd.DataFrame({"pred": counts["pred"],
                       "term": cond * np.log(cond / pt),
                       "n": n.astype(np.int64)}) \
        .groupby("pred", sort=True).agg(
            n_typed=("n", "sum"), strength=("term", "sum")) \
        .reset_index()
    return pa.table({
        "pred": pa.array(kl["pred"].astype(str)),
        "n_typed": pa.array(kl["n_typed"].to_numpy(dtype="int64"),
                            pa.int64()),
        "strength": pa.array(np.round(
            kl["strength"].to_numpy(dtype="float64"), 6), pa.float64())})
