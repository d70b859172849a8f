"""Request-processing surface (aida_ray/service.py) — parity with
RequestProcessor.java's /service/disambiguate dispatch."""

import json

import pyarrow as pa
import pytest

from aida_ray.kb.fixture import build_fixture_kb
from aida_ray.service import _settings_for_request, process_request

TEXT = ("When [[Page]] played Kashmir at Knebworth, his Les Paul was "
        "uniquely tuned.")


@pytest.fixture(scope="module")
def kb():
    return build_fixture_kb()


def test_technique_dispatch_presets():
    s = _settings_for_request({})
    assert s.technique == "graph" and s.null_mapping_threshold >= 0
    assert _settings_for_request({"technique": "PRIOR"}).technique == "prior"
    loc = _settings_for_request({"technique": "LOCAL"})
    assert loc.technique == "local"
    fast = _settings_for_request({"technique": "LOCAL", "fastMode": True})
    assert fast.similarity.max_entity_keyphrase_count > 0  # Fast pruning
    g = _settings_for_request({"technique": "GRAPH"})
    assert g.technique == "graph"
    cpsc = _settings_for_request({"technique": "GRAPH",
                                  "algorithm": "CPSC"})
    assert cpsc.algorithm == "cocktail_party_size_constrained"
    err = _settings_for_request({"technique": "NOPE"})
    assert "ERROR" in err and "valid technique" in err["ERROR"]


def test_coherence_measure_override():
    for name, kind in [("MilneWitten", "milnewitten"),
                       ("Jaccard", "inlink_overlap"), ("KORE", "kore"),
                       ("bogus", "milnewitten")]:  # default branch
        s = _settings_for_request({"technique": "GRAPH",
                                   "coherenceMeasure": name})
        assert s.similarity.ee_sims == ((kind, 1.0),)


def test_graph_overrides_and_ppweight():
    s = _settings_for_request({
        "technique": "GRAPH", "alpha": 0.3, "entitiesPerMention": 7,
        "coherenceTreshold": 1.2, "exhaustiveSearch": False,
        "nullMappingThreshold": 0.1})
    assert s.graph.alpha == 0.3
    assert s.graph.entities_per_mention_constraint == 7
    assert s.graph.coh_robustness_threshold == 1.2
    assert s.graph.use_exhaustive_search is False
    assert s.null_mapping_threshold == 0.1
    # ppWeight rescales with-prior ME weights by (1-new)/(1-old)
    base = _settings_for_request({"technique": "GRAPH"})
    old = base.similarity.prior_weight
    s2 = _settings_for_request({"technique": "GRAPH", "ppWeight": 0.2})
    scale = (1 - 0.2) / (1 - old)
    assert s2.similarity.prior_weight == 0.2
    for (k0, w0), (k2, w2) in zip(base.similarity.mes_with_prior,
                                  s2.similarity.mes_with_prior):
        assert k0 == k2 and w2 == pytest.approx(w0 * scale)


def test_process_request_golden(kb):
    r = process_request({"text": TEXT, "technique": "GRAPH",
                         "algorithm": "cpsc", "tagMode": "manual"}, kb)
    assert [m["name"] for m in r["mentions"]] == ["Page"]
    assert r["mentions"][0]["bestEntity"]["kbIdentifier"] == \
        "YAGO:Jimmy_Page"
    r2 = process_request({"text": TEXT, "technique": "PRIOR"}, kb)
    best = {m["name"]: (m.get("bestEntity") or {}).get("kbIdentifier")
            for m in r2["mentions"]}
    assert best["Page"] == "YAGO:Larry_Page"     # prior-only decision
    assert best["Kashmir"] == "YAGO:Kashmir"


def test_process_request_errors_and_compact(kb):
    assert "ERROR" in process_request({"technique": "GRAPH"}, kb)
    assert "ERROR" in process_request({"text": "x",
                                       "technique": "NOPE"}, kb)
    # ResultProcessor jsonType shaping (:89-240)
    c = process_request({"text": TEXT, "technique": "PRIOR",
                         "jsonType": "COMPACT"}, kb)
    assert "entityMetadata" not in c and "annotatedText" not in c
    assert "mentions" in c and "allEntities" in c
    at = process_request({"text": TEXT, "technique": "PRIOR",
                          "jsonType": "ANNOTATED_TEXT"}, kb)
    assert set(at.keys()) == {"docId", "formatVersion",
                              "annotatedText", "originalText"}
    w = process_request({"text": TEXT, "technique": "PRIOR",
                         "jsonType": "WEB"}, kb)
    assert "entityMetadata" in w and w["tracerHtml"].startswith("<!DOCTYPE")


def test_max_results_caps_candidates(kb):
    full = process_request({"text": TEXT, "technique": "PRIOR"}, kb)
    one = process_request({"text": TEXT, "technique": "PRIOR",
                           "maxResults": 1}, kb)
    for m in one["mentions"]:
        assert len(m["allEntities"]) <= 1
    assert len(full["mentions"]) == len(one["mentions"])


def test_external_entities_context(kb):
    """mentionDictionary + entityKeyphrases resolve an otherwise-OOKBE
    surface (the ExternalEntitiesContext path, :331-378)."""
    r = process_request({
        "text": "The band Zyzzyva played loudly.",
        "technique": "PRIOR",
        "mentionDictionary": {"Zyzzyva": ["Zyzzyva_(band)"]},
        "entityKeyphrases": {"Zyzzyva_(band)": ["band", "loudly"]}}, kb)
    best = {m["name"]: (m.get("bestEntity") or {}).get("kbIdentifier")
            for m in r["mentions"]}
    assert best.get("Zyzzyva") == "YAGO:Zyzzyva_(band)"


def test_serve_requests_stage(ray_session, kb):
    import ray

    from aida_ray.service import serve_requests
    reqs = pa.table({
        "request_id": pa.array([0, 1, 2], pa.int64()),
        "request": pa.array([
            json.dumps({"text": TEXT, "technique": "PRIOR"}),
            json.dumps({"text": TEXT, "technique": "BOGUS"}),
            "not json",
        ], pa.string())})
    out = serve_requests(ray.data.from_arrow(reqs), kb,
                         concurrency=1).to_pandas() \
        .sort_values("request_id").reset_index(drop=True)
    r0 = json.loads(out.response[0])
    assert [m["name"] for m in r0["mentions"]] == \
        ["Page", "Kashmir", "Knebworth", "Les Paul"]
    assert "ERROR" in json.loads(out.response[1])
    assert "bad request JSON" in json.loads(out.response[2])["ERROR"]


# ------------------------------------------------------- NEL eval client

def test_nel_client_parsers():
    from aida_ray.pipelines.nel_eval import (client_word_span, parse_gold,
                                             parse_token_file)
    assert parse_token_file("a\nb\n\nc\n") == ["a b", "c"]
    g = parse_gold("Page\tJimmy Page\ta0s0\t1\t2\n")
    assert g == {"a0s0\t1\t2": "Jimmy Page"}
    # the client's exact span arithmetic (-1 rides the leading space)
    s = "When Page played"
    assert client_word_span(s, 5, 4) == (1, 2)


def test_nel_eval_routes_agree(ray_session):
    from aida_ray.pipelines.nel_eval import (evaluate_nel,
                                             evaluate_nel_distributed,
                                             fixture_eval_inputs)
    kb = build_fixture_kb()
    tt, si, gt = fixture_eval_inputs()
    a = evaluate_nel(tt, si, gt, kb)
    assert a == {"right": 3, "total": 5, "accuracy": 0.6}
    assert evaluate_nel_distributed(tt, si, gt, kb, concurrency=1) == a


# ------------------------------------------------ auxiliary endpoints

def test_load_entity_metadata_and_types(kb):
    from aida_ray.service import load_entity_metadata, load_types
    m = load_entity_metadata("Jimmy_Page", kb)
    assert m["readableForm"] == "Jimmy Page"
    assert m["knowledgebase"] == "YAGO"
    assert m["url"].endswith("/Jimmy%20Page")
    assert m["importance"] > 0
    assert load_types("Jimmy_Page", kb) == ["PERSON"]
    assert load_types("Nope", kb) == []


def test_load_keyphrases_ordered(kb):
    from aida_ray.service import load_keyphrases
    kps = load_keyphrases("Jimmy_Page", kb)
    texts = [k["keyphrase"] for k in kps]
    assert "Robert Plant" in texts and "Led Zeppelin" in texts
    weights = [k["weight"] for k in kps]
    assert weights == sorted(weights, reverse=True)
    assert load_keyphrases("Nope", kb) == []


def test_milne_witten_endpoint_shape(kb):
    from aida_ray.ned.coherence import milne_witten
    from aida_ray.service import compute_milne_witten_relatedness
    r = compute_milne_witten_relatedness(
        ["Jimmy_Page"], ["Kashmir_(song)"], kb)
    want = milne_witten(kb, kb.entity2id["Jimmy_Page"],
                        kb.entity2id["Kashmir_(song)"])
    assert r == {"Jimmy_Page": {"Kashmir_(song)": want}}
    assert "Error" in compute_milne_witten_relatedness(
        ["Nope"], ["Kashmir"], kb)


def test_entity_kbid_to_id(kb):
    from aida_ray.service import entity_kbid_to_id
    assert entity_kbid_to_id("YAGO:Jimmy_Page", kb) == \
        kb.entity2id["Jimmy_Page"]
    assert entity_kbid_to_id("Jimmy_Page", kb) == \
        kb.entity2id["Jimmy_Page"]
    assert entity_kbid_to_id("YAGO:Nope", kb) == -1


def test_max_results_zero_and_multimember_gunzip(kb):
    """ADVICE r4: an explicit maxResults of 0 (int or "0") means zero
    candidates, not the silent default of 15."""
    for zero in (0, "0"):
        r = process_request({"text": TEXT, "technique": "PRIOR",
                             "maxResults": zero}, kb)
        assert r["mentions"], "sanity: mentions still emitted"
        for m in r["mentions"]:
            assert m["allEntities"] == []
    # "" and absent still mean the default
    dflt = process_request({"text": TEXT, "technique": "PRIOR",
                            "maxResults": ""}, kb)
    assert any(m["allEntities"] for m in dflt["mentions"])


def test_http_listener_roundtrip(kb):
    """r4 'missing' item 3 closed: the stdlib HTTP wrapper serves the
    demo form, accepts BOTH body encodings the reference's endpoint
    does (JSON + form-urlencoded), enforces error codes, and returns
    byte-identical payloads to the pure function."""
    import json as _json
    import threading
    import urllib.parse
    import urllib.request

    from aida_ray.service import make_http_server, process_request
    srv = make_http_server(kb)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(base + "/") as r:
            assert r.status == 200
            assert b"/service/disambiguate" in r.read()
        params = {"text": TEXT, "technique": "PRIOR", "maxResults": 3}
        want = _json.dumps(process_request(params, kb), sort_keys=True)
        # JSON body
        req = urllib.request.Request(
            base + "/service/disambiguate",
            data=_json.dumps(params).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            assert r.status == 200 and r.read().decode() == want
        # HTML-form body (numbers arrive as strings, like a browser)
        form = urllib.parse.urlencode(
            {"text": TEXT, "technique": "PRIOR", "maxResults": "3"}).encode()
        req = urllib.request.Request(
            base + "/service/disambiguate", data=form,
            headers={"Content-Type": "application/x-www-form-urlencoded"})
        with urllib.request.urlopen(req) as r:
            assert r.status == 200 and r.read().decode() == want
        # unknown technique -> 400 with the reference's ERROR payload
        req = urllib.request.Request(
            base + "/service/disambiguate",
            data=_json.dumps({"text": "x", "technique": "BOGUS"}).encode(),
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "valid technique" in e.read().decode()
        # 404 on unknown path
        try:
            urllib.request.urlopen(base + "/nope")
            raise AssertionError("expected HTTP 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.shutdown()
        srv.server_close()
