"""KG schema profiling — metapath composition counts and predicate
cardinality classes.

- :func:`metapath_counts` — length-2 metapath profile: for every
  ordered predicate pair (p1, p2), the number of path instances
  x -p1-> y -p2-> z over DISTINCT facts (the schema-level
  composition census behind path-rule mining and heterogeneous-graph
  embeddings à la metapath2vec, Dong et al. KDD'17).  Scale shape:
  one distinct pass over the assertion stream, then a fact-sized
  HASH SHUFFLE self-join (shuffle_join.hash_join on the shared
  entity key — both sides are fact-scale, so no broadcast), then a
  |P|^2-bounded groupby-count.

- :func:`pred_cardinality` — per-predicate functional profile:
  n_facts, distinct subjects/objects, max out/in fanout, and the
  1:1 / 1:N / N:1 / N:M class (integer rules only).  The KG QA
  signal behind kgqa.functional_violations: a predicate classified
  1:N whose spec says N:1 is a modeling bug.  Per-pred outputs are
  predicate-vocabulary-bounded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def _distinct_facts(triples: ray.data.Dataset, s: str, p: str,
                    o: str) -> ray.data.Dataset:
    """DISTINCT (s, p, o): per-block dedup partials + one groupby."""

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({s: b[s].to_pandas(), p: b[p].to_pandas(),
                           o: b[o].to_pandas()})
        return pa.Table.from_pandas(df.drop_duplicates(),
                                    preserve_index=False)

    return triples.map_batches(partial, batch_format="pyarrow") \
        .groupby([s, p, o]).count().select_columns([s, p, o])


def metapath_counts(triples: ray.data.Dataset, s: str = "subj",
                    p: str = "pred", o: str = "obj",
                    num_partitions: int | None = None
                    ) -> ray.data.Dataset:
    """(pred_a, pred_b, n_paths) rows: x -pred_a-> y -pred_b-> z
    path-instance counts over distinct facts (y is the join key;
    x == z paths count too — composition ignores reflexivity).

    Scale shape — the count-product identity, NOT a path-instance
    join:  n_paths(a, b) = Σ_y in_cnt(y, a) · out_cnt(y, b).  Joining
    raw facts emits one row PER PATH INSTANCE, which is quadratic in a
    hub node's degree (a single 1M-degree entity yields 10^12 join
    rows); joining the per-(node, pred) degree aggregates instead
    bounds both the shuffle and the join output by |nodes| × |preds|,
    independent of skew."""
    from ray.data.aggregate import Sum

    from aida_ray.stages.shuffle_join import hash_join

    f = _distinct_facts(triples, s, p, o)

    def deg_partial(b: pa.Table) -> pa.Table:
        # both directions in ONE pass/shuffle: side 0 = edge INTO the
        # node (pred_a candidates), side 1 = edge OUT (pred_b)
        df = pd.DataFrame({
            "node": np.concatenate([
                b[o].to_numpy(zero_copy_only=False),
                b[s].to_numpy(zero_copy_only=False)]),
            "side": np.repeat(np.array([0, 1], np.int64), len(b)),
            "pred": np.concatenate([
                b[p].to_numpy(zero_copy_only=False)] * 2),
            "c": 1})
        g = df.groupby(["node", "side", "pred"], sort=False)["c"].sum() \
            .reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    deg = f.map_batches(deg_partial, batch_format="pyarrow") \
        .groupby(["node", "side", "pred"]).aggregate(Sum("c")) \
        .materialize()                    # consumed by both join sides

    def pick(side: int, pred_name: str, cnt_name: str):
        def fn(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            m = b.filter(pc.equal(b["side"], side))
            return pa.table({"node": m["node"], pred_name: m["pred"],
                             cnt_name: m["sum(c)"]})
        return fn

    ins = deg.map_batches(pick(0, "pred_a", "ca"), batch_format="pyarrow")
    outs = deg.map_batches(pick(1, "pred_b", "cb"), batch_format="pyarrow")
    j = hash_join(ins, outs, on=("node",),
                  num_partitions=num_partitions)

    def cnt_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "pred_a": b["pred_a"].to_pandas(),
            "pred_b": b["pred_b"].to_pandas(),
            "c": (b["ca"].to_numpy(zero_copy_only=False)
                  * b["cb"].to_numpy(zero_copy_only=False))})
        g = df.groupby(["pred_a", "pred_b"], sort=False)["c"].sum() \
            .reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = j.map_batches(cnt_partial, batch_format="pyarrow") \
        .groupby(["pred_a", "pred_b"]).aggregate(Sum("c"))

    def finish(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({"pred_a": b["pred_a"], "pred_b": b["pred_b"],
                         "n_paths": pc.cast(b["sum(c)"], pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def pred_cardinality(triples: ray.data.Dataset, s: str = "subj",
                     p: str = "pred", o: str = "obj") -> pa.Table:
    """(pred, n_facts, n_subj, n_obj, max_out, max_in, card) per
    predicate over distinct facts; card ∈ {'1:1','1:N','N:1','N:M'}
    from the max fanouts (max_out = facts per (pred, subj); a
    functional predicate has max_out == 1)."""
    from ray.data.aggregate import Max, Sum

    f = _distinct_facts(triples, s, p, o).materialize()

    def side(key: str):
        def part(b: pa.Table) -> pa.Table:
            df = pd.DataFrame({p: b[p].to_pandas(),
                               key: b[key].to_pandas(), "c": 1})
            g = df.groupby([p, key], sort=False)["c"].sum().reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        per_key = f.map_batches(part, batch_format="pyarrow") \
            .groupby([p, key]).aggregate(Sum("c"))

        def pp(b: pa.Table) -> pa.Table:
            df = pd.DataFrame({p: b[p].to_pandas(),
                               "n": b["sum(c)"].to_numpy(
                                   zero_copy_only=False)})
            g = df.groupby(p, sort=False).agg(
                facts=("n", "sum"), k=("n", "size"), mx=("n", "max")) \
                .reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        return per_key.map_batches(pp, batch_format="pyarrow") \
            .groupby(p).aggregate(Sum("facts"), Sum("k"), Max("mx")) \
            .to_pandas()

    a = side(s)   # per-pred: facts, distinct subj, max out-fanout
    b = side(o)   # per-pred: facts, distinct obj, max in-fanout
    m = a.merge(b, on=p, suffixes=("_s", "_o")).sort_values(p)
    mo = m["max(mx)_s"].to_numpy(dtype="int64")
    mi = m["max(mx)_o"].to_numpy(dtype="int64")
    card = np.where((mo == 1) & (mi == 1), "1:1",
            np.where((mo > 1) & (mi == 1), "1:N",
            np.where((mo == 1) & (mi > 1), "N:1", "N:M")))
    return pa.table({
        "pred": pa.array(m[p].to_numpy().astype(str)),
        "n_facts": pa.array(m["sum(facts)_s"].to_numpy(dtype="int64")),
        "n_subj": pa.array(m["sum(k)_s"].to_numpy(dtype="int64")),
        "n_obj": pa.array(m["sum(k)_o"].to_numpy(dtype="int64")),
        "max_out": pa.array(mo, pa.int64()),
        "max_in": pa.array(mi, pa.int64()),
        "card": pa.array(card.astype(str))})


def transitive_reduction(edges: ray.data.Dataset, max_depth: int = 8,
                         src: str = "src", dst: str = "dst",
                         num_partitions: int | None = None
                         ) -> ray.data.Dataset:
    """Transitive reduction of a DAG edge set — drop every edge
    (a, b) for which a length >= 2 path a -> ... -> b exists (the
    taxonomy-cleaning step: harvested subClassOf links are full of
    shortcuts already implied by the chain; YAGO's type hierarchy is
    built with exactly this pruning).  Output: (src, dst, redundant).

    ``max_depth`` bounds the DAG's longest path — the closure is
    built by (max_depth - 1) rounds of C <- distinct(C ∪ C ⋈ E), a
    hash-shuffle join per round (closure volume tracks reachable
    pairs, bounded for taxonomy-shaped DAGs; a cyclic input would
    loop, so the caller asserts acyclicity upstream).  The redundancy
    probe is one anti-join of E against {(a, b): exists edge a -> x,
    path x => b} — assembled as E ⋈ C on the midpoint."""
    import pyarrow.compute as pc

    from aida_ray.stages.shuffle_join import hash_join

    def dedup(ds: ray.data.Dataset) -> ray.data.Dataset:
        def part(b: pa.Table) -> pa.Table:
            df = pd.DataFrame({src: b[src].to_pandas(),
                               dst: b[dst].to_pandas()})
            return pa.Table.from_pandas(df.drop_duplicates(),
                                        preserve_index=False)
        return ds.map_batches(part, batch_format="pyarrow") \
            .groupby([src, dst]).count().select_columns([src, dst])

    e = dedup(edges).materialize()

    # closure C: all (a, b) with a path of length >= 1
    c = e
    for _ in range(max_depth - 1):
        def mid(b: pa.Table) -> pa.Table:
            return pa.table({src: b[src], "m": b[dst]})

        def frm(b: pa.Table) -> pa.Table:
            return pa.table({"m": b[src], dst: b[dst]})

        ext = hash_join(c.map_batches(mid, batch_format="pyarrow"),
                        e.map_batches(frm, batch_format="pyarrow"),
                        on=("m",), num_partitions=num_partitions) \
            .select_columns([src, dst])
        new = dedup(c.union(ext)).materialize()
        if new.count() == c.count():
            c = new
            break
        c = new

    # redundant(a, b): exists edge a -> x (x != b) and path x => b
    def e_mid(b: pa.Table) -> pa.Table:
        return pa.table({src: b[src], "m": b[dst]})

    def c_frm(b: pa.Table) -> pa.Table:
        return pa.table({"m": b[src], dst: b[dst]})

    two_plus = dedup(hash_join(
        e.map_batches(e_mid, batch_format="pyarrow"),
        c.map_batches(c_frm, batch_format="pyarrow"),
        on=("m",), num_partitions=num_partitions)
        .select_columns([src, dst])).materialize()

    # flag: E semi-join two_plus (carry a ones payload — Dataset.join
    # drops the right key columns)
    def ones(b: pa.Table) -> pa.Table:
        return b.append_column("red_", pa.array(
            np.ones(b.num_rows, dtype="int64")))

    flagged = hash_join(e, two_plus.map_batches(
        ones, batch_format="pyarrow"), on=(src, dst),
        join_type="left_outer", num_partitions=num_partitions)

    def finish(b: pa.Table) -> pa.Table:
        red = b["red_"].to_numpy(zero_copy_only=False)
        return pa.table({
            src: b[src], dst: b[dst],
            "redundant": pa.array(~np.isnan(red.astype("float64"))
                                  if red.dtype.kind == "f"
                                  else red == 1, pa.bool_())})

    return flagged.map_batches(finish, batch_format="pyarrow")


# fixed-precedence lexical formats for object values; each entry is
# (name, RE2 pattern) — the same patterns a DuckDB oracle runs
VALUE_FORMATS = (
    ("int", r"^[0-9]+$"),
    ("decimal", r"^[0-9]+\.[0-9]+$"),
    ("date", r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$"),
    ("url", r"^https?://"),
    ("name", r"^[A-Z]"),
)


def pred_value_formats(triples: ray.data.Dataset, p: str = "pred",
                       o: str = "obj") -> ray.data.Dataset:
    """Per-predicate object-format profile: every object value
    classifies into the first matching lexical format (int, decimal,
    date, url, name, other) and counts aggregate per (pred, fmt) —
    the publish-time profiling step that decides whether a predicate
    column is typed numeric/date/entity-ref before the KG loads into
    a store.

    Emits (pred, fmt, n).

    Scale shape: classification is Arrow RE2 over the batch (no
    per-row Python); per-batch partials bound the one shuffle by
    predicate x format vocabulary."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        vals = b[o].cast(pa.string())
        fmt = np.full(len(vals), "other", dtype=object)
        undecided = np.ones(len(vals), dtype=bool)
        for name, pat in VALUE_FORMATS:
            m = pc.match_substring_regex(vals, pat).to_numpy(
                zero_copy_only=False)
            hit = undecided & m
            fmt[hit] = name
            undecided &= ~m
        df = pd.DataFrame({"pred": b[p].to_pandas(), "fmt": fmt})
        g = df.groupby(["pred", "fmt"], sort=False).size() \
            .rename("n").reset_index()
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = triples.map_batches(partial, batch_format="pyarrow") \
        .groupby(["pred", "fmt"]).aggregate(Sum("n"))

    def finish(b: pa.Table) -> pa.Table:
        if "sum(n)" not in b.column_names:
            return pa.table({"pred": pa.array([], pa.string()),
                             "fmt": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"pred": b["pred"], "fmt": b["fmt"],
                         "n": b["sum(n)"].cast(pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def schema_graph(triples: ray.data.Dataset, types: ray.data.Dataset,
                 s: str = "subj", p: str = "pred", o: str = "obj",
                 ent_col: str = "entity", type_col: str = "type"
                 ) -> ray.data.Dataset:
    """Instance-to-schema graph induction (the LODStats-style quotient
    graph): every instance edge maps to its (subj_type, pred,
    obj_type) supernode edge with an assertion count — the full
    signature DISTRIBUTION, where predicate_signatures keeps only the
    dominant row.

    Emits (subj_type, pred, obj_type, n); entities missing from the
    registry type as 'unknown'.

    Scale shape: registry broadcast once; per-batch partial counts
    bound the one shuffle by the schema vocabulary (types x preds x
    types), never the instance graph."""
    from ray.data.aggregate import Sum

    from aida_ray.stages.dedup import _get_cached
    from aida_ray.state.collect import collect_table

    reg = collect_table(types, schema=pa.schema(
        [(ent_col, pa.string()), (type_col, pa.string())]))
    ref = ray.put(dict(zip(reg[ent_col].to_pylist(),
                           reg[type_col].to_pylist())))

    def partial(b: pa.Table) -> pa.Table:
        tmap = _get_cached(ref)
        df = pd.DataFrame({
            "subj_type": [tmap.get(x, "unknown")
                          for x in b[s].to_pylist()],
            "pred": b[p].to_pandas(),
            "obj_type": [tmap.get(x, "unknown")
                         for x in b[o].to_pylist()]})
        g = df.groupby(["subj_type", "pred", "obj_type"],
                       sort=False).size().rename("n").reset_index()
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = triples.map_batches(partial, batch_format="pyarrow") \
        .groupby(["subj_type", "pred", "obj_type"]).aggregate(Sum("n"))

    def finish(b: pa.Table) -> pa.Table:
        if "sum(n)" not in b.column_names:
            return pa.table({"subj_type": pa.array([], pa.string()),
                             "pred": pa.array([], pa.string()),
                             "obj_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"subj_type": b["subj_type"],
                         "pred": b["pred"],
                         "obj_type": b["obj_type"],
                         "n": b["sum(n)"].cast(pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def fill_rates(triples: ray.data.Dataset, types: ray.data.Dataset,
               s: str = "subj", p: str = "pred",
               ent_col: str = "entity", type_col: str = "type"
               ) -> pa.Table:
    """Class-level completeness profile: per (type, pred) the
    fraction of the class's REGISTERED entities that assert the slot
    — the recall-style KG quality metric ("how many Countries have a
    population?").  Emits (type, pred, n_filled, n_type, rate) for
    slots with at least one filler; entities with no triples still
    count in the denominator.

    Scale shape: one distinct-(subj, pred) shuffle (fact-identity
    bounded), type mapping via the broadcast registry, and a
    (type, pred)-vocabulary rollup; class sizes come straight off
    the registry table."""
    from ray.data.aggregate import Sum

    from aida_ray.stages.dedup import _get_cached
    from aida_ray.state.collect import collect_table

    reg = collect_table(types, schema=pa.schema(
        [(ent_col, pa.string()), (type_col, pa.string())]))
    tmap = dict(zip(reg[ent_col].to_pylist(), reg[type_col].to_pylist()))
    ref = ray.put(tmap)

    def distinct_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({s: b[s].to_pandas(),
                           p: b[p].to_pandas()}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    distinct = triples.map_batches(distinct_partial,
                                   batch_format="pyarrow") \
        .groupby([s, p]).count().select_columns([s, p])

    def typed_partial(b: pa.Table) -> pa.Table:
        if s not in b.column_names:
            return pa.table({"type": pa.array([], pa.string()),
                             "pred": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        tm = _get_cached(ref)
        df = pd.DataFrame({
            "type": [tm.get(x, "unknown") for x in b[s].to_pylist()],
            "pred": b[p].to_pandas()})
        g = df.groupby(["type", "pred"], sort=False).size() \
            .rename("n").reset_index()
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    filled = collect_table(
        distinct.map_batches(typed_partial, batch_format="pyarrow")
        .groupby(["type", "pred"]).aggregate(Sum("n"))).to_pandas()
    if filled.empty:
        return pa.table({"type": pa.array([], pa.string()),
                         "pred": pa.array([], pa.string()),
                         "n_filled": pa.array([], pa.int64()),
                         "n_type": pa.array([], pa.int64()),
                         "rate": pa.array([], pa.float64())})
    sizes = pd.Series(list(tmap.values())).value_counts()
    nf = filled["sum(n)"].to_numpy(dtype="int64")
    nt = filled["type"].map(sizes).fillna(0).to_numpy(dtype="int64")
    return pa.table({
        "type": pa.array(filled["type"].astype(str)),
        "pred": pa.array(filled["pred"].astype(str)),
        "n_filled": pa.array(nf, pa.int64()),
        "n_type": pa.array(nt, pa.int64()),
        "rate": pa.array(
            np.round(nf / np.where(nt > 0, nt, 1), 6), pa.float64())})
