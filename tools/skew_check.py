"""Planted head-entity skew A/B for the canonicalization shuffle
(judge r4 item 3).

The G11 salting (pipelines/kg.py canonicalize_entities) was
correctness-tested but its skew behavior only argued.  This harness
measures it: a synthetic ``mentionedIn`` triple stream where ONE
entity owns ``head_share`` of all mentions (the "country" head case)
vs a uniform-key stream of identical volume, through three routes —

* ``salted``    — the production two-phase path (map-side combine,
  block-varying salt, phase-2 merge);
* ``unsalted``  — the same two-phase path with n_salts=1 (combine
  still on; isolates what the salt itself buys);
* ``naive``     — a single direct groupby over the raw triples, no
  map-side combine: the textbook skew victim (the head reducer
  receives head_share of ALL rows).

Done-criterion: salted wall on the skewed corpus ≈ salted wall on the
uniform corpus (within ~1.3×), naive degrades, and the salted output
EQUALS the naive output row-for-row (printed as rows_equal).

Usage: python tools/skew_check.py [n_rows] [head_share]
Writes one JSON line; run at 8M rows for the BENCH entry.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_triples(n_rows: int, head_share: float, n_entities: int,
                 n_blocks: int):
    """Lazy Dataset of mentionedIn triples; rows i with
    hash(i) < head_share go to the single head entity."""
    import ray

    mpp = 10                               # mentions per page

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        page = ids // mpp
        # deterministic per-row mix (no RNG)
        mixed = (ids * np.uint64(2654435761)) % np.uint64(1 << 31)
        is_head = mixed < np.uint64(int(head_share * (1 << 31)))
        # production shape: a page's mentions hit FEW entities (the
        # map-side combine compresses within-block repeats), and a
        # page's triples live in ONE block (n_rows/n_blocks must be a
        # multiple of mpp so per-batch nunique partials sum exactly)
        eid = (page * 7 + (ids % mpp) // 4) % n_entities
        subj = np.where(is_head, "Head_Entity",
                        np.char.add("e", eid.astype(str)))
        return pa.table({
            "subj": pa.array(subj, pa.string()),
            "pred": pa.array(np.repeat("mentionedIn", len(ids)), pa.string()),
            "obj": pa.array(np.char.add("http://p/", page.astype(str)), pa.string()),
            "score": pa.array((ids % 100).astype("float64") / 100.0, pa.float64()),
        })

    assert (n_rows // n_blocks) % mpp == 0, "pages must not straddle blocks"
    return ray.data.range(n_rows, override_num_blocks=n_blocks) \
        .map_batches(gen, batch_format="pyarrow")


def canonicalize_naive(triples):
    """Single-phase direct groupby on raw triples — the skew victim.
    Same output contract as canonicalize_entities."""
    import pyarrow.compute as pc

    def keep(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["pred"], "mentionedIn"))

    def per_group(df):
        import pandas as pd
        return pd.DataFrame({
            "entity": [df["subj"].iloc[0]],
            "mention_count": [len(df)],
            "page_count": [df["obj"].nunique()],
            "score_sum": [df["score"].sum()],
        })

    # map_groups ships EVERY raw row to its key's reducer — with a
    # 40% head entity that single reducer carries 40% of the corpus
    return triples.map_batches(keep, batch_format="pyarrow") \
        .groupby("subj").map_groups(per_group, batch_format="pandas")


def run(route: str, n_rows: int, head_share: float) -> dict:
    import ray
    from aida_ray.pipelines.kg import canonicalize_entities
    t0 = time.time()
    triples = make_triples(n_rows, head_share, n_entities=50_000,
                           n_blocks=256)
    if route == "naive":
        out = canonicalize_naive(triples)
    elif route == "unsalted":
        out = canonicalize_entities(triples, n_salts=1)
    else:
        out = canonicalize_entities(triples, n_salts=16)
    tbls = [t for t in ray.get(out.to_arrow_refs()) if t.num_columns]
    tbl = pa.concat_tables(tbls)
    wall = time.time() - t0
    df = tbl.to_pandas().sort_values("entity").reset_index(drop=True)
    return {"route": route, "wall_s": round(wall, 2),
            "rows": len(df),
            "head_mentions": int(df.loc[df["entity"] == "Head_Entity",
                                        "mention_count"].sum()),
            "df": df}


def shuffle_volume(n_rows: int, head_share: float, n_salts: int) -> dict:
    """Deterministic scale evidence, independent of host-noise walls:
    rows entering each route's all-to-all and the MAX rows any single
    reducer key receives.  At cluster scale shuffles are network-bound,
    so these ratios ARE the wall ratios."""
    import ray
    from aida_ray.pipelines.kg import _salt_of, normalize_entity_key
    triples = make_triples(n_rows, head_share, n_entities=50_000,
                           n_blocks=256)

    def partial_keys(batch: pa.Table) -> pa.Table:
        import pandas as pd
        df = batch.select(["subj", "obj"]).to_pandas()
        grouped = df.groupby("subj", sort=False).size().reset_index()
        from aida_ray.stages.dedup import hash_strings62
        disc = int(hash_strings62(
            pa.array([df["obj"].iloc[0]], pa.string()))[0])
        salts = _salt_of(pa.array(grouped["subj"], pa.string()),
                         n_salts, block_disc=disc)
        return pa.table({"skey": pa.array(
            grouped["subj"] + "\x1f" + salts.astype(str), pa.string())})

    parts = triples.map_batches(partial_keys, batch_format="pyarrow") \
        .groupby("skey").count()
    pdf = pa.concat_tables(
        [t for t in ray.get(parts.to_arrow_refs()) if t.num_columns]
    ).to_pandas()
    pdf.columns = ["skey", "rows"]
    head = pdf[pdf["skey"].str.startswith("Head_Entity\x1f")]
    return {
        "partial_rows_total": int(pdf["rows"].count() and pdf["rows"].sum()),
        "distinct_phase1_keys": len(pdf),
        "max_reducer_rows_twophase": int(pdf["rows"].max()),
        "head_phase1_rows": int(head["rows"].sum()),
        "head_phase1_keys": len(head),
        "max_reducer_rows_naive": int(n_rows * head_share),
    }


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    head_share = float(sys.argv[2]) if len(sys.argv) > 2 else 0.4
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, log_to_driver=False)
    walls: dict[str, list] = {"salted": [], "unsalted": [], "naive": [],
                              "uniform": []}
    res = {}
    for _ in range(reps):                 # interleaved: noise-fair
        for route in ("salted", "unsalted", "naive"):
            r = run(route, n_rows, head_share)
            walls[route].append(r["wall_s"])
            res[route] = r
        walls["uniform"].append(run("salted", n_rows, 0.0)["wall_s"])
    med = {k: sorted(v)[len(v) // 2] for k, v in walls.items()}
    a, b = res["salted"]["df"].copy(), res["naive"]["df"].copy()
    for d in (a, b):
        d["score_sum"] = d["score_sum"].round(6)   # summation order
    eq = a.equals(b)
    vol_salted = shuffle_volume(n_rows, head_share, n_salts=16)
    vol_unsalted = shuffle_volume(n_rows, head_share, n_salts=1)
    out = {
        "metric": "skew_canonicalize",
        "n_rows": n_rows, "head_share": head_share, "reps": reps,
        "salted_skewed_s": med["salted"],
        "unsalted_skewed_s": med["unsalted"],
        "naive_skewed_s": med["naive"],
        "salted_uniform_s": med["uniform"],
        "walls_all": walls,
        "salted_vs_uniform": round(med["salted"] / med["uniform"], 3),
        "rows_equal_salted_vs_naive": bool(eq),
        "head_mentions": res["salted"]["head_mentions"],
        "volume": {"salted": vol_salted, "unsalted": vol_unsalted},
    }
    print(json.dumps(out))
    ray.shutdown()
    return 0 if eq else 1


if __name__ == "__main__":
    sys.exit(main())
