"""Quantity extraction with SI unit normalization.

Extracts ``<number> [multiplier] <unit>`` mentions and normalizes
them to a canonical unit system — the numeric-fact companion to the
triple extractors (a web KG wants "spans 120 km" as (120000.0, 'm'),
not a string).  Public pattern family (QUANTITY spans in the
CoNLL/OntoNotes sense; unit tables are SI definitions).

Rules (deterministic, documented):
- number: integer or decimal token (``\\d+(\\.\\d+)?``);
- optional multiplier word: thousand (1e3), million (1e6),
  billion (1e9);
- unit token: if it is in the unit table the value is converted
  (``value * factor`` in IEEE double, mirroring the SQL twin
  operation-for-operation — no rounding seam); if it is NOT in the
  table, the mention only counts when a multiplier was present
  ("3.2 million users" -> (3200000.0, 'users')); a bare
  "42 frobnicators" emits nothing.

Unit table (canonical unit, factor):
  length  km->m 1000, m 1, cm 0.01, mm 0.001
  mass    t->kg 1000, kg 1, g 0.001, mg 1e-6
  time    h->s 3600, min->s 60, s 1, ms 0.001
  bytes   tb 1e12, gb 1e9, mb 1e6, kb 1e3, bytes 1
  ratio   percent -> 0.01

Scale shape: stateless ``map_batches``, module-level compiled
pattern, no shuffle.
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray
import ray.data

_UNITS: dict[str, tuple[str, float]] = {
    "km": ("m", 1000.0), "m": ("m", 1.0), "cm": ("m", 0.01),
    "mm": ("m", 0.001),
    "t": ("kg", 1000.0), "kg": ("kg", 1.0), "g": ("kg", 0.001),
    "mg": ("kg", 1e-6),
    "h": ("s", 3600.0), "hours": ("s", 3600.0), "min": ("s", 60.0),
    "s": ("s", 1.0), "ms": ("s", 0.001),
    "tb": ("b", 1e12), "gb": ("b", 1e9), "mb": ("b", 1e6),
    "kb": ("b", 1e3), "bytes": ("b", 1.0),
    "percent": ("ratio", 0.01),
}
_MULT = {"thousand": 1e3, "million": 1e6, "billion": 1e9}

_PAT = re.compile(
    r"\b(?P<num>\d+(?:\.\d+)?)\s+"
    r"(?:(?P<mult>thousand|million|billion)\s+)?"
    r"(?P<unit>[a-z]+)\b")


def extract_quantities(text: str) -> list[tuple[str, float, str]]:
    """(mention, value_si, unit_si) tuples for one document."""
    out: list[tuple[str, float, str]] = []
    for m in _PAT.finditer(text.lower()):
        value = float(m.group("num"))
        mult = m.group("mult")
        if mult:
            value = value * _MULT[mult]
        unit = m.group("unit")
        if unit in _UNITS:
            canon, factor = _UNITS[unit]
            out.append((m.group(0), value * factor, canon))
        elif mult:
            out.append((m.group(0), value, unit))
    return out


def quantity_mentions(ds: ray.data.Dataset, id_col: str = "doc_id",
                      text_col: str = "text") -> ray.data.Dataset:
    """(doc_id, mention, value_si, unit_si) rows."""

    def batch(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        did, men, val, uni = [], [], [], []
        for i, txt in zip(ids, b[text_col].to_pylist()):
            for mention, value, unit in extract_quantities(txt or ""):
                did.append(int(i))
                men.append(mention)
                val.append(value)
                uni.append(unit)
        return pa.table({
            "doc_id": pa.array(did, pa.int64()),
            "mention": pa.array(men, pa.string()),
            "value_si": pa.array(val, pa.float64()),
            "unit_si": pa.array(uni, pa.string()),
        })

    return ds.map_batches(batch, batch_format="pyarrow")
