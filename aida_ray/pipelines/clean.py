"""End-to-end corpus-cleaning pipeline: the composition story.

Chains the training-data stages a real pre-training pipeline runs —
quality gating (Gopher/C4 repetition rules) → exact dedup (lowest-id
representative per identical text) → corpus accounting — as ONE lazy
Ray Data flow: the quality stage is a stateless map that only FILTERS
(no materialization between stages), dedup is the usual partial-agg +
groupby-Min, and the final accounting is a handful of scalar
aggregates.  Every rule reuses the exact stage the standalone queries
check, so the composite inherits their oracles' semantics verbatim.

Output: one summary row
(n_docs, n_quality, n_unique, total_tokens_kept)
— input size, survivors of the quality gate, survivors of exact
dedup, and the whitespace-token volume of the cleaned corpus.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def clean_corpus_summary(ds: ray.data.Dataset,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> pa.Table:
    """Quality-gate → exact-dedup → account, streaming end to end."""
    from aida_ray.stages.dedup import exact_dedup
    from aida_ray.stages.quality_rules import quality_rules_batch

    n_docs = ds.count()

    def gate(b: pa.Table) -> pa.Table:
        q = quality_rules_batch(b, text_col=text_col, id_col=id_col)
        return b.filter(pc.equal(q["keep"], pa.scalar(True)))

    kept = ds.map_batches(gate, batch_format="pyarrow").materialize()
    n_quality = kept.count()

    unique = exact_dedup(kept, text_col=text_col,
                         id_col=id_col).materialize()
    n_unique = unique.count()

    def tok_partial(b: pa.Table) -> pa.Table:
        lists = pc.split_pattern(b[text_col].combine_chunks(),
                                 pattern=" ")
        n = pc.sum(pc.list_value_length(lists)).as_py() or 0
        return pa.table({"n": pa.array([n], pa.int64())})

    total_tokens = unique.map_batches(tok_partial,
                                      batch_format="pyarrow").sum("n") \
        or 0
    return pa.table({
        "n_docs": pa.array([n_docs], pa.int64()),
        "n_quality": pa.array([n_quality], pa.int64()),
        "n_unique": pa.array([n_unique], pa.int64()),
        "total_tokens_kept": pa.array([int(total_tokens)], pa.int64())})
