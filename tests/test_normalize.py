"""Unicode normalization: the kernel's laws (idempotence, Cf-deletion
vs Zs-spacing, NFKC agreement with unicodedata) and the fixture pins."""

from __future__ import annotations

import unicodedata

from hypothesis import given, settings
from hypothesis import strategies as st

from dronedb_spark.text.normalize import _CASES, normalize_documents, normalize_str


def test_cases_table_is_exact():
    for inp, out in _CASES:
        assert normalize_str(inp) == out


def test_idempotent_on_cases():
    for inp, _ in _CASES:
        once = normalize_str(inp)
        assert normalize_str(once) == once


def test_cf_deleted_zs_spaced():
    # zero-width joiner inside a word must NOT split it...
    assert normalize_str("co‍operate") == "cooperate"
    # ...while an ideographic space (Zs) must
    assert normalize_str("a　b") == "a b"


def test_decomposed_and_composed_hash_identically():
    composed = "café"
    decomposed = "café"
    assert composed != decomposed  # different byte strings...
    assert normalize_str(composed) == normalize_str(decomposed)  # ...same content


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=60))
def test_matches_unicodedata_reference(s):
    want = unicodedata.normalize("NFKC", s)
    want = "".join(
        "" if unicodedata.category(c) == "Cf"
        else (" " if unicodedata.category(c) in ("Zs", "Cc") else c)
        for c in want
    )
    assert normalize_str(s) == " ".join(want.split())


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=40))
def test_idempotent_property(s):
    once = normalize_str(s)
    assert normalize_str(once) == once


def test_dataframe_kernel_matches_local(spark):
    rows = [(i, inp) for i, (inp, _) in enumerate(_CASES)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["text_norm"], r["changed"]) for r in
           normalize_documents(df).collect()}
    for i, (inp, out) in enumerate(_CASES):
        assert got[i] == (out, inp != out)
