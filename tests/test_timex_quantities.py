"""TIMEX-lite (stages/timex.py) + quantity extraction
(stages/quantities.py)."""

import pyarrow as pa

import ray.data

from aida_ray.stages.quantities import (extract_quantities,
                                        quantity_mentions)
from aida_ray.stages.timex import normalize_timex, timex_mentions


# ----------------------------------------------------------- timex

def test_iso_passthrough():
    assert normalize_timex("due 2021-05-03 sharp") == [
        ("2021-05-03", "2021-05-03")]


def test_iso_invalid_month_skipped():
    assert normalize_timex("code 2021-13-03 here") == []


def test_month_day_year():
    assert normalize_timex("born May 3 , 2021 in town") == [
        ("May 3 , 2021", "2021-05-03")]
    assert normalize_timex("born May 3 2021") == [
        ("May 3 2021", "2021-05-03")]


def test_day_month_year():
    assert normalize_timex("on 3 May 2021") == [
        ("3 May 2021", "2021-05-03")]


def test_month_year_granularity():
    assert normalize_timex("since May 2021") == [
        ("May 2021", "2021-05")]


def test_bare_year():
    assert normalize_timex("back in 1987 it began") == [
        ("1987", "1987")]
    # outside the 1500-2099 window
    assert normalize_timex("item 1203 listed") == []


def test_full_date_does_not_double_emit_year():
    got = normalize_timex("met on 3 May 2021 again")
    assert got == [("3 May 2021", "2021-05-03")]


def test_relative_needs_dct():
    assert normalize_timex("due yesterday") == []
    assert normalize_timex("due yesterday", dct="2021-01-01") == [
        ("yesterday", "2020-12-31")]
    assert normalize_timex("due tomorrow", dct="2021-12-31") == [
        ("tomorrow", "2022-01-01")]
    assert normalize_timex("due today", dct="2021-06-15") == [
        ("today", "2021-06-15")]


def test_month_abbreviation():
    assert normalize_timex("on Jan 5 , 1999") == [
        ("Jan 5 , 1999", "1999-01-05")]


def test_timex_dataset_stage(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([3], pa.int64()),
        "text": pa.array(["shipped 2020-02-02 , due yesterday"]),
        "dct": pa.array(["2020-03-01"])}))
    out = timex_mentions(ds, dct_col="dct").to_pandas()
    assert list(out["value"]) == ["2020-02-02", "2020-02-29"]


# ------------------------------------------------------- quantities

def test_known_units():
    assert extract_quantities("spans 120 km of track") == [
        ("120 km", 120000.0, "m")]
    assert extract_quantities("weighs 5 g here") == [
        ("5 g", 5 * 0.001, "kg")]
    assert extract_quantities("took 3 min flat") == [
        ("3 min", 180.0, "s")]
    assert extract_quantities("holds 2 tb disks") == [
        ("2 tb", 2e12, "b")]
    assert extract_quantities("rose 7 percent overall") == [
        ("7 percent", 7 * 0.01, "ratio")]


def test_multiplier_with_known_unit():
    assert extract_quantities("cost 3 thousand kg") == [
        ("3 thousand kg", 3e3, "kg")]


def test_multiplier_with_free_noun():
    assert extract_quantities("about 3.2 million users joined") == [
        ("3.2 million users", float("3.2") * 1e6, "users")]


def test_bare_noun_without_multiplier_skipped():
    assert extract_quantities("saw 42 frobnicators there") == []


def test_decimal_known_unit():
    assert extract_quantities("ran 2.5 km today") == [
        ("2.5 km", float("2.5") * 1000.0, "m")]


def test_quantity_dataset_stage(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([9], pa.int64()),
        "text": pa.array(["spans 120 km and 3 million users"])}))
    out = quantity_mentions(ds).to_pandas()
    assert list(out["unit_si"]) == ["m", "users"]
    assert list(out["value_si"]) == [120000.0, 3e6]
