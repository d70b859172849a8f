"""Request-processing surface — the reference's /service/disambiguate
endpoint semantics, Ray-native.

The reference's primary user entry point is a JAX-RS endpoint
(src/mpi/aida/service/web/RequestProcessor.java:463-517 form surface,
:230-404 JSON surface, :760-1010 the dispatch).  This module
re-implements the REQUEST SEMANTICS — parameter parsing, the
technique/algorithm/coherence dispatch onto the 17-preset registry,
per-request setting overrides, external entity context, result-JSON
shaping — as a pure function plus a Ray actor-pool stage.  The
reference's Jetty/JAX-RS wrapper and HTML demo form are covered too
(r5): :func:`make_http_server` binds the endpoint with the stdlib
``http.server`` (JSON and form-urlencoded bodies, the demo page on
``GET /``) — proving the promised "any web framework wraps
``process_request`` in a dozen lines" claim with zero dependencies.

Parameter → behavior parity (RequestProcessor.java line refs):

* ``technique``: PRIOR | LOCAL | LOCAL-IDF | GRAPH | GRAPH-IDF |
  GRAPH-KORE | GRAPH-JACCARD, default CocktailPartyWithHeuristics-
  DisambiguationWithNullSettings (:850-889); unknown → the
  reference's exact ERROR payload (:884-888).
* ``fastMode`` picks the Fast presets for LOCAL/GRAPH (:855-866).
* ``algorithm`` "cpsc" upgrades GRAPH to the size-constrained
  algorithm (:868-874).
* ``coherenceMeasure`` MilneWitten | Jaccard | KORE replaces the
  EE-similarity list with one measure at weight 1.0 (:892-912;
  Jaccard maps to InlinkOverlap exactly as the reference does).
* ``alpha``/``entitiesPerMention``/``coherenceTreshold``/
  ``exhaustiveSearch``/``nullMappingThreshold`` override graph/null
  settings (:915-965).
* ``ppWeight`` rescales the with-prior ME weights by
  ``(1-new)/(1-old)`` for GRAPH, as adjustSimSettingsForNewPriorWeight
  does (:677-692, :944-948).
* ``tagMode`` "manual" switches to [[...]]-driven mention detection.
* ``filteringTypes`` "KB:type,KB:type" → candidate type filter (J4).
* ``mentionDictionary``/``entityKeyphrases`` → external entity
  context merged as a KB view (:331-378; ned/external.py).
* ``maxResults`` caps candidates per mention in the response JSON
  (default 15, :995-998).
* ``docId`` defaults to a DETERMINISTIC text-hash id (the reference
  appends System.currentTimeMillis(), :976-978 — dropped here so
  replays and Ray task retries are reproducible; documented
  deviation).

``jsonType`` accepts DEFAULT/COMPACT (WEB's HTML weave is the demo
UI's concern, out of scope with the rest of the webapp)."""

from __future__ import annotations

import hashlib
import json
from dataclasses import replace

import pyarrow as pa

from aida_ray.kb.kb import KB, OOKBE
from aida_ray.ned.settings import DisambiguationSettings, preset

_COH_MEASURES = {
    # reference switch (RequestProcessor.java:895-908); default falls
    # back to MilneWitten exactly like the reference's default branch
    "MilneWitten": "milnewitten",
    "Jaccard": "inlink_overlap",
    "KORE": "kore",
}

_TECHNIQUE_ERROR = ("Please specify a valid technique. Valid technuques "
                    "are: LOCAL, LOCAL-IDF, GRAPH, GRAPH-IDF, GRAPH-KORE, "
                    "GRAPH-KORELSH, GRAPH-JACCARD.")


def _settings_for_request(params: dict) -> DisambiguationSettings | dict:
    """Technique dispatch + per-request overrides; an error dict on an
    unknown technique (the reference's ERROR JSON, :884-888)."""
    technique = params.get("technique")
    fast = bool(params.get("fastMode"))
    if technique is None:
        s = preset("CocktailPartyWithHeuristicsDisambiguationWithNullSettings")
    elif technique == "PRIOR":
        s = preset("PriorOnlyDisambiguationSettings")
    elif technique == "LOCAL":
        s = preset("FastLocalKeyphraseBasedDisambiguationSettings" if fast
                   else "LocalKeyphraseBasedDisambiguationSettings")
    elif technique == "LOCAL-IDF":
        s = preset("LocalKeyphraseIDFBasedDisambiguationSettings")
    elif technique == "GRAPH":
        s = preset("FastCocktailPartyDisambiguationSettings" if fast
                   else "CocktailPartyDisambiguationSettings")
        algo = params.get("algorithm")
        if algo is not None and algo.lower() == "cpsc":
            s = replace(s, algorithm="cocktail_party_size_constrained")
    elif technique == "GRAPH-IDF":
        s = preset("CocktailPartyKOREIDFDisambiguationSettings")
    elif technique == "GRAPH-KORE":
        s = preset("CocktailPartyKOREDisambiguationSettings")
    elif technique == "GRAPH-JACCARD":
        s = preset("CocktailPartyJaccardDisambiguationSettings")
    else:
        return {"ERROR": _TECHNIQUE_ERROR}

    coh = params.get("coherenceMeasure")
    if coh is not None:
        kind = _COH_MEASURES.get(coh, "milnewitten")
        s = replace(s, similarity=replace(
            s.similarity, ee_sims=((kind, 1.0),)))

    g = s.graph
    if params.get("alpha") is not None:
        g = replace(g, alpha=float(params["alpha"]))
    if params.get("entitiesPerMention") is not None:
        g = replace(g, entities_per_mention_constraint=int(
            params["entitiesPerMention"]))
    if params.get("coherenceTreshold") is not None:
        g = replace(g, coh_robustness_threshold=float(
            params["coherenceTreshold"]))
    if params.get("exhaustiveSearch") is not None:
        g = replace(g, use_exhaustive_search=bool(
            params["exhaustiveSearch"]))
    s = replace(s, graph=g)

    pp = params.get("ppWeight")
    if pp is not None and s.technique == "graph":
        # adjustSimSettingsForNewPriorWeight (:677-692)
        old = s.similarity.prior_weight
        if old != 1:
            scale = (1.0 - float(pp)) / (1.0 - old)
            s = replace(s, similarity=replace(
                s.similarity,
                mes_with_prior=tuple(
                    (k, w * scale) for k, w in s.similarity.mes_with_prior),
                prior_weight=float(pp)))

    if params.get("nullMappingThreshold") is not None:
        s = replace(s, null_mapping_threshold=float(
            params["nullMappingThreshold"]))
    if params.get("tagMode") == "manual":
        s = replace(s, mention_detection="manual")
    ft = params.get("filteringTypes")
    if ft:
        s = replace(s, type_filter=tuple(
            t.strip() for t in ft.split(",") if t.strip()))
    return s


def process_request(params: dict, kb: KB) -> dict:
    """One /service/disambiguate request → the result-JSON dict.

    ``params`` uses the JSON endpoint's field names (:247-330).
    Deterministic for a given (params, kb)."""
    from aida_ray.io.result_json import to_result_json
    from aida_ray.ned.disambiguator import disambiguate_document
    from aida_ray.ned.doc import manual_filter

    text = params.get("text")
    if not text:
        return {"ERROR": "missing required field 'text'"}
    settings = _settings_for_request(params)
    if isinstance(settings, dict):
        return settings

    doc_id = params.get("docId") or \
        "req_" + hashlib.md5(text.encode("utf-8")).hexdigest()[:12]

    external = None
    md = params.get("mentionDictionary")
    ekp = params.get("entityKeyphrases")
    if md and ekp:                       # both required, like the eec
        external = (dict(md), dict(ekp))  # guard at :375-377

    results = disambiguate_document(doc_id, text, kb, settings,
                                    external=external)
    cleaned, _ = manual_filter(text)
    out = json.loads(to_result_json(doc_id, cleaned, results, kb))

    mr = params.get("maxResults")
    max_results = 15 if mr in (None, "") else int(mr)  # explicit 0 means 0
    for m in out.get("mentions", []):
        m["allEntities"] = m["allEntities"][:max_results]
    out["docId"] = doc_id

    # jsonType shaping — ResultProcessor.process (ResultProcessor.java
    # :89-240): ANNOTATED_TEXT stops after the weave; COMPACT drops
    # the weave and the metadata/type tables; DEFAULT is the full
    # payload; WEB = DEFAULT + the demo-UI tracer HTML (served as the
    # S7 annotated-HTML rendering — the Java GraphTracer HTML is the
    # webapp's concern, out of scope with the rest of the UI).
    jt = params.get("jsonType") or "DEFAULT"
    if jt == "ANNOTATED_TEXT":
        out = {k: out[k] for k in ("docId", "formatVersion",
                                   "annotatedText", "originalText")}
    elif jt == "COMPACT":
        for k in ("annotatedText", "entityMetadata", "allTypes"):
            out.pop(k, None)
    elif jt == "WEB":
        from aida_ray.io.result_json import to_html
        out["tracerHtml"] = to_html(doc_id, cleaned, results, kb)
    return out


def load_entity_metadata(entity: str, kb: KB) -> dict:
    """/service/loadEntityMetaData (:534-552): metadata + importance
    for one entity, by NAME (this engine's public identifier — the
    reference's integer ids are a Postgres artifact).  Depiction /
    description fields are None like a KB without those tables."""
    from aida_ray.io.result_json import _entity_metadata
    m = _entity_metadata(kb, entity)
    return {"readableForm": m["readableRepr"], "url": m["url"],
            "importance": m["importance"],
            "knowledgebase": m["knowledgebase"],
            "depictionurl": None, "description": None,
            "depictionthumbnailurl": None}


def load_keyphrases(entity: str, kb: KB) -> list[dict]:
    """/service/loadKeyphrases (:556-563): the entity's keyphrases
    with their MI weights, heaviest first (EntityDetailsLoader
    semantics over our keyphrase index)."""
    eid = kb.entity2id.get(entity)
    if eid is None:
        return []
    out = []
    for kp in kb.entity_kps.get(eid, []):
        words = [kb.id2word.get(t, "?") for t in kb.kp_tokens.get(kp, ())]
        weight = max((kb.kw_mi.get(eid, {}).get(t, 0.0)
                      for t in kb.kp_tokens.get(kp, ())), default=0.0)
        out.append({"keyphrase": " ".join(words), "weight": weight})
    out.sort(key=lambda d: (-d["weight"], d["keyphrase"]))
    return out


def load_types(entity: str, kb: KB) -> list[str]:
    """/service/loadTypes (:588-594)."""
    eid = kb.entity2id.get(entity)
    return sorted(kb.entity_types.get(eid, ())) if eid is not None else []


def extract_keyphrases(text: str) -> list[str]:
    """/service/extractKeyphrases (:570-585): noun-phrase keyphrases
    from free text via the POS-regex extractor (M18)."""
    from aida_ray.ned.keyphrases import extract_keyphrases_pos
    return extract_keyphrases_pos(text)


def entity_kbid_to_id(kb_id: str, kb: KB) -> int:
    """/service/entityKbId2Id (:598-606): ``KB:Entity_Name`` → the
    engine's internal integer entity id (-1 when unknown, the
    reference's out-of-KB id convention)."""
    name = kb_id.split(":", 1)[1] if ":" in kb_id else kb_id
    return kb.entity2id.get(name, -1)


def compute_milne_witten_relatedness(sources: list[str],
                                     targets: list[str],
                                     kb: KB) -> dict:
    """/service/computeMilneWittenRelatedness (:609-675): nested
    {source: {target: score}} over the cross product, the endpoint's
    exact result shape."""
    from aida_ray.ned.coherence import milne_witten
    out: dict = {}
    for s in sources:
        sid = kb.entity2id.get(s)
        row: dict = {}
        for t in targets:
            tid = kb.entity2id.get(t)
            if sid is None or tid is None:
                return {"Error": "Error creating EE-Similarity processor."}
            row[t] = milne_witten(kb, sid, tid)
        out[s] = row
    return out


class RequestStage:
    """Actor-pool stage: a batch of requests in, responses out —
    the service surface at corpus scale (pin the KB once per actor,
    one JSON request per row)."""

    def __init__(self, kb_ref):
        from aida_ray.state.broadcast import resolve
        self.kb = resolve(kb_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, resps = [], []
        for rid, req in zip(batch["request_id"].to_pylist(),
                            batch["request"].to_pylist()):
            try:
                params = json.loads(req)
            except json.JSONDecodeError as e:
                resp = {"ERROR": f"bad request JSON: {e}"}
            else:
                resp = process_request(params, self.kb)
            ids.append(rid)
            resps.append(json.dumps(resp, sort_keys=True))
        return pa.table({
            "request_id": pa.array(ids, pa.int64()),
            "response": pa.array(resps, pa.string())})


def serve_requests(requests, kb, concurrency: int = 2,
                   batch_size: int = 64):
    """(request_id, request JSON string) Dataset → (request_id,
    response JSON string): the endpoint as a streaming Ray stage."""
    import ray

    from aida_ray.state.broadcast import put_kb
    ref = kb if not isinstance(kb, KB) else put_kb(kb)
    return requests.map_batches(
        RequestStage, batch_format="pyarrow", batch_size=batch_size,
        fn_constructor_kwargs={"kb_ref": ref},
        concurrency=concurrency, num_cpus=1)


# ---------------------------------------------------------------- HTTP
_DEMO_HTML = """<!DOCTYPE html>
<html><head><title>aida_ray disambiguation demo</title></head>
<body>
<h1>aida_ray /service/disambiguate</h1>
<form method="post" action="/service/disambiguate">
<p><textarea name="text" rows="6" cols="80"
placeholder="Paste text; [[bracketed]] spans are manual mentions."
></textarea></p>
<p>technique <select name="technique">
<option>GRAPH</option><option>PRIOR</option><option>LOCAL</option>
<option>GRAPH-KORE</option><option>GRAPH-JACCARD</option></select>
jsonType <select name="jsonType"><option>DEFAULT</option>
<option>COMPACT</option><option>ANNOTATED_TEXT</option>
<option>WEB</option></select>
maxResults <input name="maxResults" size="3" value="15">
<input type="submit" value="Disambiguate"></p>
</form></body></html>
"""


def make_http_server(kb: KB, host: str = "127.0.0.1", port: int = 0):
    """The reference's Jetty/JAX-RS wrapper, stdlib-only (the dozen
    lines SURVEY §2.11 promised a framework needs around
    :func:`process_request`): ``POST /service/disambiguate`` accepts a
    JSON body or an HTML-form urlencoded body (the two content types
    RequestProcessor.java:463-517 serves) and returns the result JSON;
    ``GET /`` serves the demo form.  Returns an ``http.server``
    ``ThreadingHTTPServer`` bound to an OS-assigned port — call
    ``serve_forever()`` (or ``handle_request()`` in tests) and
    ``server_close()`` yourself; one KB, shared across requests, as in
    the reference service."""
    import urllib.parse
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):        # quiet: tests own stdout
            pass

        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path in ("/", "/index.html"):
                self._send(200, _DEMO_HTML.encode(), "text/html")
            else:
                self._send(404, b'{"ERROR": "not found"}',
                           "application/json")

        def do_POST(self):
            if self.path != "/service/disambiguate":
                self._send(404, b'{"ERROR": "not found"}',
                           "application/json")
                return
            n = int(self.headers.get("Content-Length") or 0)
            raw = self.rfile.read(n)
            ctype = (self.headers.get("Content-Type") or "").split(";")[0]
            try:
                if ctype == "application/json":
                    params = json.loads(raw.decode("utf-8"))
                else:                     # HTML form post
                    params = {k: v[0] for k, v in urllib.parse.parse_qs(
                        raw.decode("utf-8")).items()}
            except (ValueError, UnicodeDecodeError) as e:
                self._send(400, json.dumps(
                    {"ERROR": f"bad request body: {e}"}).encode(),
                    "application/json")
                return
            resp = process_request(params, kb)
            code = 400 if "ERROR" in resp else 200
            self._send(code, json.dumps(resp, sort_keys=True).encode(),
                       "application/json")

    return ThreadingHTTPServer((host, port), Handler)
