"""Result-JSON assembly with the reference's documented shape (S8/M17).

Mirrors ResultProcessor.java / AidaRESTJsonResults (shape documented at
README.md:198-288): formatVersion, annotatedText (``[[KB:Entity|mention]]``
weave), originalText, allEntities, entityMetadata (knowledgebase,
entityId, readableRepr, url, importance, type), mentions (offset, name,
length, bestEntity + allEntities with disambiguation scores), allTypes.

Deterministic: dict insertion order follows mention offset order and
sorted entity names, so the serialized JSON is stable per input.
Usable per row inside a stateless ``map_batches``.
"""

from __future__ import annotations

import json
from urllib.parse import quote

import pyarrow as pa

from aida_ray.kb.kb import OOKBE, KB

FORMAT_VERSION = "2.3"
KB_NAME = "YAGO"


def _entity_metadata(kb: KB, name: str) -> dict:
    eid = kb.entity2id.get(name)
    inlinks = kb.inlinks.get(eid, ()) if eid is not None else ()
    return {
        "knowledgebase": KB_NAME,
        "importance": len(inlinks) / kb.collection_size,
        "entityId": name,
        "type": sorted(kb.entity_types.get(eid, ())) if eid is not None else [],
        "readableRepr": name.replace("_", " "),
        "url": "http://en.wikipedia.org/wiki/" + quote(name.replace("_", " ")),
    }


def annotate_text(text: str, results) -> str:
    """Weave ``[[KB:Entity|mention]]`` markup into the original text
    (GenerateWebHtml-style annotation; OOKBE mentions left unmarked)."""
    out = []
    pos = 0
    for r in sorted(results, key=lambda r: (r.char_offset, r.char_length)):
        if r.entity == OOKBE or r.char_offset < pos:
            continue
        out.append(text[pos:r.char_offset])
        out.append(f"[[{KB_NAME}:{r.entity}|"
                   f"{text[r.char_offset:r.char_offset + r.char_length]}]]")
        pos = r.char_offset + r.char_length
    out.append(text[pos:])
    return "".join(out)


def to_result_json(doc_id: str, text: str, results, kb: KB,
                   overall_time_ms: int = 0) -> str:
    """One document's annotations → the reference's JSON result string."""
    linked = [r for r in results if r.entity != OOKBE]
    all_entities = sorted({f"{KB_NAME}:{r.entity}" for r in linked})
    metadata = {key: _entity_metadata(kb, key.split(":", 1)[1])
                for key in all_entities}
    mentions = []
    for r in sorted(results, key=lambda r: (r.char_offset, r.char_length)):
        best = None
        if r.entity != OOKBE:
            best = {"kbIdentifier": f"{KB_NAME}:{r.entity}",
                    "disambiguationScore": f"{r.score:.5f}".rstrip("0").rstrip(".") or "0"}
        mentions.append({
            "allEntities": [best] if best else [],
            "offset": r.char_offset,
            "name": r.mention,
            "length": r.char_length,
            "bestEntity": best,
        })
    all_types = sorted({t for m in metadata.values() for t in m["type"]})
    return json.dumps({
        "formatVersion": FORMAT_VERSION,
        "annotatedText": annotate_text(text, results),
        "originalText": text,
        "overallTime": str(overall_time_ms),
        "docId": doc_id,
        "allEntities": all_entities,
        "entityMetadata": metadata,
        "mentions": mentions,
        "allTypes": all_types,
    }, ensure_ascii=False)


def result_json_batch(batch: pa.Table, kb_ref, settings=None) -> pa.Table:
    """Stateless map_batches stage: (url, text) rows → (url, result_json)."""
    from aida_ray.ned.disambiguator import disambiguate_document
    from aida_ray.state.broadcast import resolve
    kb = resolve(kb_ref)
    urls = batch["url"].to_pylist()
    texts = batch["text"].to_pylist()
    out = [to_result_json(u, t, disambiguate_document(u, t, kb, settings), kb)
           for u, t in zip(urls, texts)]
    return pa.table({"url": pa.array(urls, pa.string()),
                     "result_json": pa.array(out, pa.string())})


def to_html(doc_id: str, text: str, results, kb: KB) -> str:
    """Annotated HTML output (S7 — util/htmloutput/HtmlGenerator.java
    semantics): linked mentions become anchors to the entity url, OOKBE
    mentions a highlighted span; text is HTML-escaped."""
    import html as _html

    out = [f"<!DOCTYPE html><html><head><meta charset=\"utf-8\">"
           f"<title>{_html.escape(doc_id)}</title></head><body><p>"]
    pos = 0
    for r in sorted(results, key=lambda r: (r.char_offset, r.char_length)):
        if r.char_offset < pos:
            continue
        out.append(_html.escape(text[pos:r.char_offset]))
        surface = _html.escape(
            text[r.char_offset:r.char_offset + r.char_length])
        if r.entity == OOKBE:
            out.append(f'<span class="ookbe">{surface}</span>')
        else:
            meta = _entity_metadata(kb, r.entity)
            out.append(f'<a href="{meta["url"]}" '
                       f'title="{_html.escape(r.entity)} '
                       f'({r.score:.5f})">{surface}</a>')
        pos = r.char_offset + r.char_length
    out.append(_html.escape(text[pos:]))
    out.append("</p></body></html>")
    return "".join(out)
