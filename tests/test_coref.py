"""Coreference-lite (stages/coref.py) — parallelism preferences,
recency fallback, plural fan-out, and the Dataset stage."""

import pyarrow as pa

import ray.data

from aida_ray.stages.coref import pronoun_antecedents, resolve_pronouns


def test_subject_object_parallelism():
    assert resolve_pronouns("Alice met Bob . She praised him .") == [
        (1, "she", "Alice"), (1, "him", "Bob")]


def test_it_recency():
    assert resolve_pronouns("Carol built Acme . It grew fast .") == [
        (1, "it", "Acme")]


def test_plural_fans_out_over_previous_sentence():
    assert resolve_pronouns("Dan and Eve left . They returned .") == [
        (1, "they", "Dan"), (1, "they", "Eve")]


def test_fallback_nearest_preceding():
    # previous sentence has no mentions -> recency fallback
    got = resolve_pronouns("Frank slept . The day ended . He woke .")
    assert got == [(2, "he", "Frank")]


def test_no_antecedent_emits_nothing():
    assert resolve_pronouns("She left early .") == []
    assert resolve_pronouns("Nothing happened here .") == []


def test_same_sentence_recency_for_it():
    assert resolve_pronouns("Grace fixed Widget and it worked .") == [
        (0, "it", "Widget")]


def test_multiword_mentions():
    got = resolve_pronouns("New York grew . It sprawled .")
    assert got == [(1, "it", "New York")]


def test_dataset_stage(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "text": pa.array(["Alice met Bob . She praised him ."])}))
    out = pronoun_antecedents(ds).to_pandas()
    assert list(out["antecedent"]) == ["Alice", "Bob"]
    assert list(out["doc_id"]) == [7, 7]
