"""aida_ray — a Ray-Data-native knowledge-graph-construction engine.

From-scratch re-implementation of the semantics of the AIDA named-entity
disambiguation stack (reference: wujsAct/aida, see SURVEY.md) as
``ray.data`` pipelines over Arrow batches:

    pages parquet ──read_parquet──▶ extract+tokenize (stateless map_batches)
        ──▶ mention detection + candidate lookup + disambiguation
            (actor pool holding the broadcast KB)
        ──▶ mention-level rows ──▶ entity canonicalization (salted groupby)
        ──▶ (subj, pred, obj) triples ──▶ partitioned parquet + manifests

The per-document disambiguation kernel (``aida_ray.ned``) is pure Python /
numpy and runs *inside* ``map_batches`` — only the KB state and the
canonicalization shuffle are distributed concerns.
"""

__version__ = "0.1.0"

# Runtime fix for Ray's hash-shuffle empty-first-block schema broadcast
# (see aida_ray/state/raypatch.py for the upstream bug analysis).
from aida_ray.state import raypatch as _raypatch

_raypatch.install()
