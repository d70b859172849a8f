"""ReVerb-style Open IE (stages/openie.py) — pattern FSM, argument
noun runs, constraints, normalization, and the Dataset stage."""

import pyarrow as pa
import pytest

import ray.data

from aida_ray.stages.openie import (
    extract_openie, normalize_relation, openie_triples)


def test_v_w_p_longest_match():
    # greedy V W* P: relation swallows the infix noun, arg2 follows P
    assert extract_openie("alice founded acme in paris .") == [
        ("alice", "founded acme in", "paris")]


def test_bare_verb():
    assert extract_openie("bob likes tea .") == [("bob", "likes", "tea")]


def test_verb_particle():
    assert extract_openie("carol set up shop .") == [
        ("carol", "set up", "shop")]


def test_aux_chain():
    assert extract_openie("dave was born in town .") == [
        ("dave", "was born in", "town")]


def test_pronoun_subject_dropped():
    # pronouns never form argument noun runs (lexical constraint)
    assert extract_openie("it acquired corp .") == []
    assert extract_openie("they won cups .") == []


def test_adverb_skipped_for_args():
    assert extract_openie("eve quickly joined club .") == [
        ("eve", "joined", "club")]


def test_multi_token_args():
    assert extract_openie("green tea helps busy people .") == [
        ("green tea", "helps", "busy people")]


def test_determiner_skipped():
    assert extract_openie("the fox passed the gate .") == [
        ("fox", "passed", "gate")]


def test_infix_cap():
    # five W tokens between verb and preposition exceeds max_infix=4
    txt = "x gave a1 b1 c1 d1 e1 to y ."
    assert extract_openie(txt, max_infix=4) == []
    assert extract_openie(txt, max_infix=5) == [
        ("x", "gave a1 b1 c1 d1 e1 to", "y")]


def test_multi_sentence_and_missing_terminator():
    txt = "ann likes figs . ben built houses"
    assert extract_openie(txt) == [
        ("ann", "likes", "figs"), ("ben", "built", "houses")]


def test_empty_and_verbless():
    assert extract_openie("") == []
    assert extract_openie("red blue green .") == []


def test_normalize_relation():
    assert normalize_relation("was born in") == "born in"
    assert normalize_relation("is") == "is"  # keeps at least one token
    assert normalize_relation("has quickly moved to") == "moved to"


def test_stage_dataset():
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["ann likes figs .", "red blue ."], pa.string()),
    }))
    out = pa.concat_tables(
        [r for r in (ray.get(ref) for ref in
                     openie_triples(ds).to_arrow_refs()) if r.num_rows],
    ).to_pydict()
    assert out == {"doc_id": [1], "arg1": ["ann"], "rel": ["likes"],
                   "rel_norm": ["likes"], "arg2": ["figs"]}
