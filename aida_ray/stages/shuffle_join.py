"""Large-large distributed equi-joins (hash shuffle join).

When BOTH sides of a join are fact-sized, the broadcast pattern used
everywhere else in this repo (`relational.revenue_by_nation`,
`dedup` semi-joins, `range_join.broadcast_range_join`) stops working:
neither side fits in a `ray.put` blob.  The scale-correct shape is a
hash SHUFFLE join — both inputs are hash-partitioned on the join key so
matching keys land on the same aggregator, and each partition joins
independently.  Ray Data ships exactly this as ``Dataset.join``
(hash-shuffle into ``num_partitions`` aggregator actors); this module
wraps it with the repo's sizing conventions and adds the two pieces the
built-in lacks:

- **Reduce-width sizing** (`hash_join`): `num_partitions` defaults to
  the cluster-width heuristic used by every other shuffle here
  (`kg._shuffle_partitions`), scaling with the cluster rather than a
  hard-coded constant.  At 100 TB you raise it so each partition's
  slice of BOTH sides fits an aggregator's heap (`partition_size_hint`
  is forwarded for the planner's memory math).
- **Skew guard** (`salted_join`): a hash join sends every row of a hot
  key to ONE aggregator; a head key with 10^8 fact rows is a straggler
  no matter how many partitions you buy.  `salted_join` replicates the
  (small) build side S ways and salts the probe side
  ``hash(key) % S``, so a hot key's probe rows spread over S
  aggregators; correctness is unchanged because each probe row still
  meets every build row of its key exactly once.

Semi/anti joins (`exists` / `not exists`) reuse the same machinery via
``join_type='left_semi'|'left_anti'`` — the probe side streams through
and only keys are shuffled from the build side's perspective.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def _default_partitions() -> int:
    from aida_ray.pipelines.kg import _shuffle_partitions
    return _shuffle_partitions()


def hash_join(left: ray.data.Dataset, right: ray.data.Dataset,
              on: Sequence[str], right_on: Optional[Sequence[str]] = None,
              join_type: str = "inner",
              num_partitions: Optional[int] = None,
              partition_size_hint: Optional[int] = None) -> ray.data.Dataset:
    """Distributed hash shuffle join of two large Datasets.

    Thin, sized wrapper over ``Dataset.join``: hash-partitions both
    sides on the key into ``num_partitions`` independent aggregators.
    Prefer a broadcast map-side join whenever one side is small — a
    shuffle join moves BOTH sides through the object store and spins an
    aggregator actor pool (seconds of fixed latency; see
    STATUS.md round-2 item 1), so it is the right tool only when
    neither side fits in memory.
    """
    n = num_partitions or _default_partitions()
    return left.join(right, join_type=join_type, num_partitions=n,
                     on=tuple(on),
                     right_on=tuple(right_on) if right_on else None,
                     partition_size_hint=partition_size_hint)


def salted_join(probe: ray.data.Dataset, build: ray.data.Dataset,
                on: str, num_salts: int = 8,
                num_partitions: Optional[int] = None) -> ray.data.Dataset:
    """Inner hash join that survives probe-side key skew.

    The build side is replicated ``num_salts`` times with a salt column
    (cheap: build is the smaller side); each probe row gets
    ``salt = hash(key) % num_salts`` mixed with the row position so one
    hot key's rows spread across salts.  Join key becomes
    (key, salt) — hot-key probe rows now land on up to ``num_salts``
    aggregators instead of one.  Output schema equals ``hash_join``'s
    (the salt column is dropped).
    """
    def replicate(b: pa.Table) -> pa.Table:
        parts = []
        for s in range(num_salts):
            parts.append(b.append_column(
                "_salt", pa.array([s] * len(b), pa.int32())))
        return pa.concat_tables(parts)

    def salt_probe(b: pa.Table) -> pa.Table:
        # position-mixed so a single hot key spreads uniformly
        import numpy as np
        idx = np.arange(len(b), dtype=np.int64)
        key_hash = pc.hash(b[on]) if hasattr(pc, "hash") else None
        if key_hash is not None:
            salt = pc.cast(
                pc.bit_wise_and(pc.add(pc.cast(key_hash, pa.int64()),
                                       pa.array(idx)),
                                num_salts - 1), pa.int32())
        else:
            salt = pa.array((idx % num_salts).astype("int32"))
        return b.append_column("_salt", salt)

    if num_salts & (num_salts - 1):
        raise ValueError("num_salts must be a power of two")
    build_s = build.map_batches(replicate, batch_format="pyarrow")
    probe_s = probe.map_batches(salt_probe, batch_format="pyarrow")
    joined = hash_join(probe_s, build_s, on=(on, "_salt"),
                       join_type="inner", num_partitions=num_partitions)
    return joined.drop_columns(["_salt"])


def _distinct(ds: ray.data.Dataset,
              cols: Sequence[str]) -> ray.data.Dataset:
    """SQL-DISTINCT on `cols`: block-local dedup (free) then the key
    shuffle dedups globally — volume tracks distinct tuples."""
    def local(b: pa.Table) -> pa.Table:
        import pandas as pd
        return pa.Table.from_pandas(
            pa.table({c: b[c] for c in cols}).to_pandas()
            .drop_duplicates(), preserve_index=False)

    return ds.map_batches(local, batch_format="pyarrow") \
        .groupby(list(cols)).count().drop_columns(["count()"])


def _set_op(a: ray.data.Dataset, b: ray.data.Dataset,
            cols: Sequence[str], want_max: int) -> ray.data.Dataset:
    """Shared INTERSECT/EXCEPT plan: block-LOCAL dedup per side (free),
    tag with a side id (a=1, b=2), union, ONE groupby Min/Max — no
    per-side global distinct, no join aggregator pool.  A key present
    in both sides has min=1 ∧ max=2 (INTERSECT); only in `a` ⇒ max=1
    (EXCEPT).  Multiplicity across blocks doesn't matter, so one
    shuffle of block-distinct tuples is the whole cost."""
    def local_tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            import pandas as pd
            df = pa.table({c: t[c] for c in cols}).to_pandas() \
                .drop_duplicates()
            out = pa.Table.from_pandas(df, preserve_index=False)
            return out.append_column(
                "_side", pa.array([side] * len(out), pa.int64()))
        return f

    both = a.map_batches(local_tag(1), batch_format="pyarrow") \
        .union(b.map_batches(local_tag(2), batch_format="pyarrow"))
    # bucketed combine — Ray's sort-based aggregate pays Python per
    # key, ruinous over a customer-scale distinct key space
    from aida_ray.stages.agg import bucket_reduce
    agg = bucket_reduce(both, list(cols),
                        {"lo": ("_side", "min"),
                         "hi": ("_side", "max")})

    def keep(t: pa.Table) -> pa.Table:
        if want_max == 2:      # intersect: seen from both sides
            mask = pc.and_(pc.equal(t["lo"], 1), pc.equal(t["hi"], 2))
        else:                  # except: never seen from side b
            mask = pc.equal(t["hi"], 1)
        return t.filter(mask).select(list(cols))

    return agg.map_batches(keep, batch_format="pyarrow")


def table_intersect(a: ray.data.Dataset, b: ray.data.Dataset,
                    cols: Sequence[str]) -> ray.data.Dataset:
    """SQL INTERSECT — distinct rows present in both sides."""
    return _set_op(a, b, cols, want_max=2)


def table_except(a: ray.data.Dataset, b: ray.data.Dataset,
                 cols: Sequence[str]) -> ray.data.Dataset:
    """SQL EXCEPT — distinct rows of `a` absent from `b`."""
    return _set_op(a, b, cols, want_max=1)


# ------------------------------------------------------- demo pipelines

def order_lineitem_revenue(lineitem: ray.data.Dataset,
                           orders: ray.data.Dataset) -> ray.data.Dataset:
    """Revenue per order priority via a genuine large-large shuffle
    join: lineitem (6M rows/sf) ⋈ orders (1.5M rows/sf) on orderkey,
    then the usual map-side partial + tiny groupby.  Int64 cents keep
    the result bit-exact at any parallelism."""
    from aida_ray.stages.relational import _cents

    joined = hash_join(
        lineitem, orders, on=("l_orderkey",), right_on=("o_orderkey",),
        join_type="inner")

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({
            "o_orderpriority": b["o_orderpriority"],
            "cents": _cents(b["l_extendedprice"]),
        }).to_pandas()
        g = t.groupby("o_orderpriority", sort=False).agg(
            revenue_cents=("cents", "sum"), n_items=("cents", "size"))
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    from ray.data.aggregate import Sum
    agg = joined.map_batches(partial, batch_format="pyarrow") \
        .groupby("o_orderpriority") \
        .aggregate(Sum("revenue_cents"), Sum("n_items"))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderpriority": b["o_orderpriority"],
            "revenue_cents": pc.cast(b["sum(revenue_cents)"], pa.int64()),
            "n_items": pc.cast(b["sum(n_items)"], pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def customers_without_orders(customer: ray.data.Dataset,
                             orders: ray.data.Dataset) -> ray.data.Dataset:
    """Anti join: customer keys with no order row (NOT EXISTS)."""
    return hash_join(customer.select_columns(["c_custkey"]),
                     orders.select_columns(["o_custkey"]),
                     on=("c_custkey",), right_on=("o_custkey",),
                     join_type="left_anti")


def customers_with_orders(customer: ray.data.Dataset,
                          orders: ray.data.Dataset) -> ray.data.Dataset:
    """Semi join: customer keys with at least one order (EXISTS)."""
    return hash_join(customer.select_columns(["c_custkey"]),
                     orders.select_columns(["o_custkey"]),
                     on=("c_custkey",), right_on=("o_custkey",),
                     join_type="left_semi")


def intersect_and_except(a: ray.data.Dataset, b: ray.data.Dataset,
                         cols: Sequence[str]):
    """INTERSECT(a, b) and EXCEPT(a, b) from ONE shared aggregate —
    both answers are row-filters over the same (key, min-side,
    max-side) table, so running them separately would pay the tag +
    shuffle twice for nothing.  Returns (intersect_ds, except_ds)."""
    def local_tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            import pandas as pd
            df = pa.table({c: t[c] for c in cols}).to_pandas() \
                .drop_duplicates()
            out = pa.Table.from_pandas(df, preserve_index=False)
            return out.append_column(
                "_side", pa.array([side] * len(out), pa.int64()))
        return f

    both = a.map_batches(local_tag(1), batch_format="pyarrow") \
        .union(b.map_batches(local_tag(2), batch_format="pyarrow"))
    from aida_ray.stages.agg import bucket_reduce
    agg = bucket_reduce(both, list(cols),
                        {"lo": ("_side", "min"),
                         "hi": ("_side", "max")}).materialize()

    def keep_inter(t: pa.Table) -> pa.Table:
        return t.filter(pc.and_(pc.equal(t["lo"], 1),
                                pc.equal(t["hi"], 2))) \
            .select(list(cols))

    def keep_except(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["hi"], 1)).select(list(cols))

    return (agg.map_batches(keep_inter, batch_format="pyarrow"),
            agg.map_batches(keep_except, batch_format="pyarrow"))
