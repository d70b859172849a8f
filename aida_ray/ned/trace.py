"""Per-decision explanation traces (GraphTracer analogue).

The reference ships an experiment tracer (``src/mpi/experiment/trace/``,
GraphTracer + TracerParts HTML) that records, per mention, every
candidate with its prior, keyphrase-similarity and graph weights plus
the final decision — the tool for debugging P/R regressions.  This is
the Ray-native reduction of that surface to a flat Arrow table: one row
per (mention, candidate) with the score components and a ``chosen``
flag, computed with exactly the production kernels (same candidate
lookup, same EnsembleSimilarity, same solver), so the trace can never
drift from the pipeline it explains.
"""

from __future__ import annotations

import pyarrow as pa

from aida_ray.kb.kb import OOKBE, KB
from aida_ray.ned.disambiguator import prepare_document, solve_prepared
from aida_ray.ned.settings import DisambiguationSettings
from aida_ray.ned.similarity import EnsembleSimilarity


def trace_decisions(doc_id: str, text: str, kb: KB,
                    settings: DisambiguationSettings | None = None
                    ) -> pa.Table:
    """One row per (mention, candidate): prior, local similarity, and
    whether the configured technique chose it.  Mentions with no
    candidates emit a single OOKBE row."""
    settings = settings or DisambiguationSettings()
    doc = prepare_document(doc_id, text, kb, settings)
    results = solve_prepared(doc, kb, settings,
                             settings.hill_climbing_seed)
    chosen_by_span = {(r.char_offset, r.char_length): r.entity
                      for r in results}
    ens = EnsembleSimilarity(kb, doc, doc.mentions, settings.similarity)
    cols = {"mention": [], "begin": [], "candidate": [], "prior": [],
            "local_sim": [], "chosen": []}
    for mi, m in enumerate(doc.mentions):
        winner = chosen_by_span.get((m.char_offset, m.char_length), OOKBE)
        if not m.candidates:
            cols["mention"].append(m.mention)
            cols["begin"].append(m.char_offset)
            cols["candidate"].append(OOKBE)
            cols["prior"].append(0.0)
            cols["local_sim"].append(0.0)
            cols["chosen"].append(winner == OOKBE)
            continue
        for eid, prior in m.candidates:
            name = kb.id2entity[eid]
            cols["mention"].append(m.mention)
            cols["begin"].append(m.char_offset)
            cols["candidate"].append(name)
            cols["prior"].append(float(prior))
            cols["local_sim"].append(float(ens.similarity(m, eid)))
            cols["chosen"].append(name == winner)
    return pa.table({
        "mention": pa.array(cols["mention"], pa.string()),
        "begin": pa.array(cols["begin"], pa.int32()),
        "candidate": pa.array(cols["candidate"], pa.string()),
        "prior": pa.array(cols["prior"], pa.float64()),
        "local_sim": pa.array(cols["local_sim"], pa.float64()),
        "chosen": pa.array(cols["chosen"], pa.bool_()),
    })
