"""AMIE-style horn-rule mining over a (subj, pred, obj) triple table.

Distributed re-expression of the AMIE support/confidence framework
(Galarraga, Teflioudi, Hose & Suchanek 2013, "AMIE: Association Rule
Mining under Incomplete Evidence in Ontological Knowledge Bases") for
the two rule shapes that dominate web-extracted KGs:

- :func:`mine_pair_rules` — synonym/implication rules
  ``b(x, y) => h(x, y)`` (e.g. cityOf => locatedIn);
- :func:`mine_path_rules` — composition rules
  ``p1(x, y) AND p2(y, z) => h(x, z)`` (e.g. bornIn + cityOf =>
  nationality).

Both report AMIE's *standard* confidence: ``support`` = number of
distinct variable bindings satisfying body AND head, ``body_size`` =
distinct bindings satisfying the body, ``confidence = support /
body_size`` (CWA denominator — the PCA variant is a denominator swap
the caller can derive).

Scale shape: the assertion stream is first collapsed to DISTINCT
facts (block-level dedup + one groupby — same pattern as
kgqa.functional_violations); pair rules then need ONE shuffle keyed
by the (subj, obj) pair; path rules need two more (join entities on
the shared variable y, then bindings vs head facts keyed by (x, z)).
Every aggregate AFTER the binding joins is predicate-pair-bounded
(|P|^2 rows), so the final confidence division happens on a
driver-side table the size of the predicate vocabulary — the big
data never leaves the cluster.  Hub entities (large in-degree AND
out-degree on the same node) quadratically inflate the y-join; the
``max_fanout`` guard drops those groups explicitly (logged in the
output contract) rather than silently OOMing — at web scale you'd
salt or sample hubs, and rules they support are recoverable from the
surviving tail.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from aida_ray.state.collect import collect_table

_SEP = "\x1f"


def _distinct_facts(triples: ray.data.Dataset, s: str, p: str,
                    o: str) -> ray.data.Dataset:
    """Globally-distinct (s, p, o) rows: block-level dedup partial,
    then one groupby over the collapsed stream."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({s: b[s].to_pandas(), p: b[p].to_pandas(),
                           o: b[o].to_pandas()}).drop_duplicates()
        df["one"] = np.int64(1)
        return pa.Table.from_pandas(df, preserve_index=False)

    return triples.map_batches(partial, batch_format="pyarrow") \
        .groupby([s, p, o]).aggregate(Sum("one"))


def _finish_confidence(counts: pa.Table, sizes: dict,
                       body_cols: list[str], min_support: int,
                       out_body: list[str]) -> pa.Table:
    """Small driver-side finish: join |rules| count rows against the
    |P|-bounded body-size dict and divide."""
    df = counts.to_pandas()
    if len(df) == 0:
        cols = {c: pd.Series([], dtype=object) for c in out_body}
        cols["support"] = pd.Series([], dtype=np.int64)
        cols["body_size"] = pd.Series([], dtype=np.int64)
        cols["confidence"] = pd.Series([], dtype=np.float64)
        return pa.Table.from_pandas(pd.DataFrame(cols),
                                    preserve_index=False)
    df = df[df["support"] >= min_support].copy()
    key = list(zip(*(df[c] for c in body_cols))) if len(body_cols) > 1 \
        else list(df[body_cols[0]])
    df["body_size"] = [int(sizes[k]) for k in key]
    df["support"] = df["support"].astype(np.int64)
    df["confidence"] = (df["support"] / df["body_size"]).round(6)
    return pa.Table.from_pandas(df.reset_index(drop=True),
                                preserve_index=False)


def mine_pair_rules(triples: ray.data.Dataset, min_support: int = 1,
                    s: str = "subj", p: str = "pred",
                    o: str = "obj") -> pa.Table:
    """``body_pred(x, y) => head_pred(x, y)`` rules with columns
    (body_pred, head_pred, support, body_size, confidence).

    One (subj, obj)-keyed shuffle emits every ordered predicate pair
    co-asserted on the same entity pair; body sizes are the per-pred
    distinct-pair counts (a |P|-row aggregate).  The result is
    |P|^2-bounded, returned as an Arrow table.
    """
    from ray.data.aggregate import Sum

    facts = _distinct_facts(triples, s, p, o)

    def keyed(b: pa.Table) -> pa.Table:
        subj = b[s].to_pandas().astype(str)
        obj = b[o].to_pandas().astype(str)
        return pa.table({
            "pairkey": pa.array((subj + _SEP + obj).tolist(),
                                pa.string()),
            "pred_": pa.array(b[p].to_pandas().astype(str).tolist(),
                              pa.string())})

    def per_pair(df: pd.DataFrame) -> pd.DataFrame:
        preds = sorted(set(df["pred_"]))
        bp, hp = [], []
        for a in preds:
            for h in preds:
                if a != h:
                    bp.append(a)
                    hp.append(h)
        return pd.DataFrame({"body_pred": bp, "head_pred": hp,
                             "one": np.ones(len(bp), dtype=np.int64)})

    co = facts.map_batches(keyed, batch_format="pyarrow") \
        .groupby("pairkey").map_groups(per_pair, batch_format="pandas") \
        .groupby(["body_pred", "head_pred"]).aggregate(Sum("one"))

    def size_rows(b: pa.Table) -> pa.Table:
        return pa.table({
            "pred_": b[p],
            "one": pa.array(np.ones(b.num_rows, dtype=np.int64))})

    sz = collect_table(
        facts.map_batches(size_rows, batch_format="pyarrow")
        .groupby("pred_").aggregate(Sum("one")),
        schema=pa.schema([("pred_", pa.string()),
                          ("sum(one)", pa.int64())]))
    sizes = dict(zip(sz["pred_"].to_pylist(),
                     sz["sum(one)"].to_pylist()))

    counts = collect_table(
        co, schema=pa.schema([("body_pred", pa.string()),
                              ("head_pred", pa.string()),
                              ("sum(one)", pa.int64())]))
    counts = counts.rename_columns(["body_pred", "head_pred", "support"])
    return _finish_confidence(counts, sizes, ["body_pred"], min_support,
                              ["body_pred", "head_pred"])


def mine_path_rules(triples: ray.data.Dataset, min_support: int = 1,
                    max_fanout: int | None = None, s: str = "subj",
                    p: str = "pred", o: str = "obj") -> pa.Table:
    """``p1(x, y) AND p2(y, z) => head_pred(x, z)`` rules with columns
    (p1, p2, head_pred, support, body_size, confidence).

    Bindings with ``x == z`` are excluded (distinct-variable
    convention).  ``max_fanout`` drops y-groups whose in*out product
    exceeds the bound (hub guard; None = no cap).
    """
    from ray.data.aggregate import Sum

    facts = _distinct_facts(triples, s, p, o)

    def roles(b: pa.Table) -> pa.Table:
        subj = b[s].to_pandas().astype(str)
        pred = b[p].to_pandas().astype(str)
        obj = b[o].to_pandas().astype(str)
        # 'in' rows arrive at y == obj (they are the p1 leg);
        # 'out' rows leave y == subj (the p2 leg)
        y = pd.concat([obj, subj], ignore_index=True)
        role = np.concatenate([np.zeros(len(subj), dtype=np.int8),
                               np.ones(len(subj), dtype=np.int8)])
        pr = pd.concat([pred, pred], ignore_index=True)
        other = pd.concat([subj, obj], ignore_index=True)
        return pa.table({"y": pa.array(y.tolist(), pa.string()),
                         "role": pa.array(role),
                         "pr": pa.array(pr.tolist(), pa.string()),
                         "other": pa.array(other.tolist(), pa.string())})

    def compose(df: pd.DataFrame) -> pd.DataFrame:
        ins = df[df["role"] == 0]
        outs = df[df["role"] == 1]
        if len(ins) == 0 or len(outs) == 0 or (
                max_fanout is not None
                and len(ins) * len(outs) > max_fanout):
            return pd.DataFrame({"p1": pd.Series([], dtype=object),
                                 "p2": pd.Series([], dtype=object),
                                 "x": pd.Series([], dtype=object),
                                 "z": pd.Series([], dtype=object),
                                 "one": pd.Series([], dtype=np.int64)})
        cross = ins.merge(outs, how="cross", suffixes=("_a", "_b"))
        cross = cross[cross["other_a"] != cross["other_b"]]
        return pd.DataFrame({"p1": cross["pr_a"].to_numpy(),
                             "p2": cross["pr_b"].to_numpy(),
                             "x": cross["other_a"].to_numpy(),
                             "z": cross["other_b"].to_numpy(),
                             "one": np.ones(len(cross), dtype=np.int64)})

    bindings = facts.map_batches(roles, batch_format="pyarrow") \
        .groupby("y").map_groups(compose, batch_format="pandas") \
        .groupby(["p1", "p2", "x", "z"]).aggregate(Sum("one"))

    # tagged union keyed by the (x, z) pair: body bindings vs head facts
    def body_rows(b: pa.Table) -> pa.Table:
        x = b["x"].to_pandas().astype(str)
        z = b["z"].to_pandas().astype(str)
        return pa.table({
            "pairkey": pa.array((x + _SEP + z).tolist(), pa.string()),
            "tag": pa.array(np.zeros(b.num_rows, dtype=np.int8)),
            "a": b["p1"], "b": b["p2"]})

    def head_rows(b: pa.Table) -> pa.Table:
        subj = b[s].to_pandas().astype(str)
        obj = b[o].to_pandas().astype(str)
        return pa.table({
            "pairkey": pa.array((subj + _SEP + obj).tolist(),
                                pa.string()),
            "tag": pa.array(np.ones(b.num_rows, dtype=np.int8)),
            "a": b[p],
            "b": pa.array([""] * b.num_rows, pa.string())})

    tagged = bindings.map_batches(body_rows, batch_format="pyarrow") \
        .union(facts.map_batches(head_rows, batch_format="pyarrow"))

    def match(df: pd.DataFrame) -> pd.DataFrame:
        bodies = df[df["tag"] == 0]
        heads = df[df["tag"] == 1]
        p1s, p2s, hs = [], [], []
        for a, b2 in zip(bodies["a"], bodies["b"]):
            # one body-size marker per binding (head_pred = '')
            p1s.append(a)
            p2s.append(b2)
            hs.append("")
            for h in heads["a"]:
                p1s.append(a)
                p2s.append(b2)
                hs.append(h)
        return pd.DataFrame({"p1": p1s, "p2": p2s, "head_pred": hs,
                             "one": np.ones(len(p1s), dtype=np.int64)})

    counts = collect_table(
        tagged.groupby("pairkey").map_groups(match,
                                             batch_format="pandas")
        .groupby(["p1", "p2", "head_pred"]).aggregate(Sum("one")),
        schema=pa.schema([("p1", pa.string()), ("p2", pa.string()),
                          ("head_pred", pa.string()),
                          ("sum(one)", pa.int64())]))
    df = counts.to_pandas()
    bs = df[df["head_pred"] == ""]
    sizes = {(a, b): int(n) for a, b, n in
             zip(bs["p1"], bs["p2"], bs["sum(one)"])}
    sup = df[df["head_pred"] != ""].rename(
        columns={"sum(one)": "support"}).reset_index(drop=True)
    return _finish_confidence(
        pa.Table.from_pandas(sup, preserve_index=False), sizes,
        ["p1", "p2"], min_support, ["p1", "p2", "head_pred"])


def relation_jaccard(triples: ray.data.Dataset,
                     min_jaccard: float = 0.0, s: str = "subj",
                     p: str = "pred", o: str = "obj") -> pa.Table:
    """DIRT-style relation similarity (Lin & Pantel 2001, "DIRT —
    Discovery of Inference Rules from Text", reduced to its
    set-overlap core): two predicates are paraphrase candidates when
    their DISTINCT (subj, obj) argument-pair sets overlap.

    Emits one row per unordered predicate pair with
    ``jaccard = |A ∩ B| / |A ∪ B|`` >= min_jaccard, columns
    (pred_a, pred_b, inter, size_a, size_b, jaccard) with
    pred_a < pred_b.

    Reuses the pair-rule machinery: the intersection count IS the
    pair-rule support, so this is the same single (subj, obj)-keyed
    shuffle with a symmetric |P|^2-bounded finish.
    """
    rules = mine_pair_rules(triples, min_support=1, s=s, p=p, o=o)
    df = rules.to_pandas()
    df = df[df["body_pred"] < df["head_pred"]].copy()
    if len(df) == 0:
        return pa.table({
            "pred_a": pa.array([], pa.string()),
            "pred_b": pa.array([], pa.string()),
            "inter": pa.array([], pa.int64()),
            "size_a": pa.array([], pa.int64()),
            "size_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64())})
    # body_size is |A|; |B| comes from the mirrored rule's body_size,
    # equal to support_ab + (rows of B outside A): recover it from the
    # symmetric rule (b => a) present in the same result
    rev = rules.to_pandas().set_index(["body_pred", "head_pred"])
    size_b = [int(rev.loc[(b, a), "body_size"])
              for a, b in zip(df["body_pred"], df["head_pred"])]
    inter = df["support"].astype("int64")
    size_a = df["body_size"].astype("int64")
    union = size_a.to_numpy() + np.asarray(size_b) - inter.to_numpy()
    jac = (inter.to_numpy() / union).round(6)
    keep = jac >= min_jaccard
    return pa.table({
        "pred_a": pa.array(df["body_pred"].to_numpy()[keep]),
        "pred_b": pa.array(df["head_pred"].to_numpy()[keep]),
        "inter": pa.array(inter.to_numpy()[keep], pa.int64()),
        "size_a": pa.array(size_a.to_numpy()[keep], pa.int64()),
        "size_b": pa.array(np.asarray(size_b, dtype=np.int64)[keep],
                           pa.int64()),
        "jaccard": pa.array(jac[keep], pa.float64())})


def mine_inverse_rules(triples: ray.data.Dataset, min_support: int = 1,
                       s: str = "subj", p: str = "pred",
                       o: str = "obj") -> pa.Table:
    """``body_pred(x, y) => head_pred(y, x)`` inverse rules
    (AMIE's inverse-equivalence pattern; body_pred == head_pred
    measures predicate SYMMETRY), columns (body_pred, head_pred,
    support, body_size, confidence).

    Support counts ordered entity pairs (x, y) with body(x, y) AND
    head(y, x) — self-loops x == y count once, symmetric assertions
    both ways.  Scale shape: ONE fact-sized hash-shuffle join of the
    distinct facts against their own REVERSED key (subj·obj vs
    obj·subj), then a |P|^2-bounded groupby; body sizes are the
    |P|-row per-pred distinct-fact counts."""
    from ray.data.aggregate import Sum

    from aida_ray.stages.shuffle_join import hash_join
    from aida_ray.state.collect import collect_table

    facts = _distinct_facts(triples, s, p, o).materialize()

    def fwd(b: pa.Table) -> pa.Table:
        subj = b[s].to_pandas().astype(str)
        obj = b[o].to_pandas().astype(str)
        return pa.table({"k": pa.array((subj + _SEP + obj).tolist()),
                         "body_pred": b[p]})

    def rev(b: pa.Table) -> pa.Table:
        subj = b[s].to_pandas().astype(str)
        obj = b[o].to_pandas().astype(str)
        return pa.table({"k": pa.array((obj + _SEP + subj).tolist()),
                         "head_pred": b[p]})

    j = hash_join(facts.map_batches(fwd, batch_format="pyarrow"),
                  facts.map_batches(rev, batch_format="pyarrow"),
                  on=("k",))

    def cnt(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"body_pred": b["body_pred"].to_pandas(),
                           "head_pred": b["head_pred"].to_pandas(),
                           "one": 1})
        g = df.groupby(["body_pred", "head_pred"], sort=False)["one"] \
            .sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    co = collect_table(
        j.map_batches(cnt, batch_format="pyarrow")
        .groupby(["body_pred", "head_pred"]).aggregate(Sum("one")),
        schema=pa.schema([("body_pred", pa.string()),
                          ("head_pred", pa.string()),
                          ("sum(one)", pa.int64())]))

    def size_rows(b: pa.Table) -> pa.Table:
        return pa.table({
            "pred_": b[p],
            "one": pa.array(np.ones(b.num_rows, dtype=np.int64))})

    sz = collect_table(
        facts.map_batches(size_rows, batch_format="pyarrow")
        .groupby("pred_").aggregate(Sum("one")),
        schema=pa.schema([("pred_", pa.string()),
                          ("sum(one)", pa.int64())]))
    sizes = dict(zip(sz["pred_"].to_pylist(),
                     sz["sum(one)"].to_pylist()))

    df = co.to_pandas().rename(columns={"sum(one)": "support"})
    df = df[df["support"] >= min_support].copy()
    df["body_size"] = df["body_pred"].map(sizes).astype("int64")
    df["confidence"] = (df["support"] / df["body_size"]).round(6)
    df = df.sort_values(["body_pred", "head_pred"]) \
        .reset_index(drop=True)
    return pa.table({
        "body_pred": pa.array(df["body_pred"].astype(str)),
        "head_pred": pa.array(df["head_pred"].astype(str)),
        "support": pa.array(df["support"].to_numpy(dtype="int64")),
        "body_size": pa.array(df["body_size"].to_numpy(dtype="int64")),
        "confidence": pa.array(df["confidence"].to_numpy(
            dtype="float64"))})


def pra_path_features(triples: ray.data.Dataset, s: str = "subj",
                      p: str = "pred", o: str = "obj",
                      num_partitions: int | None = None
                      ) -> ray.data.Dataset:
    """PRA (Path Ranking Algorithm) length-2 path features: one row
    per (src, dst, pred_a, pred_b) with the number of distinct
    intermediate nodes z such that src -pred_a-> z -pred_b-> dst —
    the feature table a link-prediction scorer trains on (Lao &
    Cohen's random-walk features restricted to exact path counts).

    Scale shape: one hash join of the distinct-fact table with itself
    keyed on the INTERMEDIATE node (per-node fanout-bounded, the same
    plan as kgprofile.metapath_counts), then per-batch partial counts
    so the groupby ships (src, dst, path)-distinct rows."""
    from ray.data.aggregate import Sum

    from aida_ray.stages.shuffle_join import hash_join

    f = _distinct_facts(triples, s, p, o)

    def left(b: pa.Table) -> pa.Table:
        return pa.table({"src": b[s], "pred_a": b[p], "node": b[o]})

    def right(b: pa.Table) -> pa.Table:
        return pa.table({"node": b[s], "pred_b": b[p], "dst": b[o]})

    j = hash_join(f.map_batches(left, batch_format="pyarrow"),
                  f.map_batches(right, batch_format="pyarrow"),
                  on=("node",), num_partitions=num_partitions)

    def cnt_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"src": b["src"].to_pandas(),
                           "dst": b["dst"].to_pandas(),
                           "pred_a": b["pred_a"].to_pandas(),
                           "pred_b": b["pred_b"].to_pandas(), "c": 1})
        g = df.groupby(["src", "dst", "pred_a", "pred_b"],
                       sort=False)["c"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = j.map_batches(cnt_partial, batch_format="pyarrow") \
        .groupby(["src", "dst", "pred_a", "pred_b"]) \
        .aggregate(Sum("c"))

    def finish(b: pa.Table) -> pa.Table:
        if "sum(c)" not in b.column_names:
            return pa.table({
                "src": pa.array([], pa.string()),
                "dst": pa.array([], pa.string()),
                "pred_a": pa.array([], pa.string()),
                "pred_b": pa.array([], pa.string()),
                "n_paths": pa.array([], pa.int64())})
        return pa.table({"src": b["src"], "dst": b["dst"],
                         "pred_a": b["pred_a"], "pred_b": b["pred_b"],
                         "n_paths": b["sum(c)"].cast(pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def apply_rules(triples: ray.data.Dataset,
                rules: list[tuple[str, str, str]],
                s: str = "subj", p: str = "pred", o: str = "obj"
                ) -> ray.data.Dataset:
    """KG completion by Horn-rule application: for each rule
    (rule_id, p_body, p_head) and distinct fact (x, p_body, y),
    infer (x, p_head, y) UNLESS the KG already asserts it — the
    forward-chaining step that consumes mine_pair_rules' output.

    Emits (subj, pred, obj, rule_id) for inferred-only facts.

    Scale shape: rules broadcast (tiny); candidates generate
    per batch off the distinct-fact stream; the exists-check is the
    tag-and-groupby anti-join (one shuffle keyed by candidate
    identity — no join operator), with per-group work bounded by
    rules-per-fact."""

    rl = list(rules)
    f = _distinct_facts(triples, s, p, o)

    def gen(b: pa.Table) -> pa.Table:
        sv = b[s].to_pylist()
        pv = b[p].to_pylist()
        ov = b[o].to_pylist()
        rs_, rp_, ro_, rid, isf = [], [], [], [], []
        for su, pr, ob in zip(sv, pv, ov):
            # the fact itself (blocks inference of existing heads)
            rs_.append(su); rp_.append(pr); ro_.append(ob)
            rid.append(""); isf.append(np.int64(1))
            for rule_id, body, head in rl:
                if pr == body:
                    rs_.append(su); rp_.append(head); ro_.append(ob)
                    rid.append(rule_id); isf.append(np.int64(0))
        return pa.table({s: pa.array(rs_, pa.string()),
                         p: pa.array(rp_, pa.string()),
                         o: pa.array(ro_, pa.string()),
                         "rule_id": pa.array(rid, pa.string()),
                         "is_fact": pa.array(isf, pa.int64())})

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        if g["is_fact"].max() == 1:
            return pd.DataFrame({s: [], p: [], o: [], "rule_id": []})
        cand = g[g["is_fact"] == 0].drop_duplicates(
            subset=["rule_id"]).sort_values("rule_id")
        return cand[[s, p, o, "rule_id"]]

    return f.map_batches(gen, batch_format="pyarrow") \
        .groupby([s, p, o]).map_groups(per_key, batch_format="pandas")
