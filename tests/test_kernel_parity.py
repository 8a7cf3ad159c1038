"""Two-implementation consistency check (SURVEY.md §5.2 item 1):
the vectorized Spark kernel must match the single-node oracle
span-for-span on the full fixture matrix, and both must match the
committed goldens.  This stands in for the reference's golden corpus
(empty /root/reference mount, SURVEY.md §0) under the BASELINE.json
equality invariant (kind, text, media_ref, order)."""

from __future__ import annotations

import json
import os

import pytest

from freki_spark import fixtures, kernel, oracle

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "fixture_goldens.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def matrix():
    return fixtures.fixture_matrix()


def _tuples(out):
    return [[s["kind"], s["text"], s["media_ref"], s["offset"]] for s in out]


def test_goldens_cover_matrix(golden, matrix):
    assert {d["doc_id"] for d in matrix} == set(golden)


def test_oracle_matches_goldens(golden, matrix):
    for d in matrix:
        out, err = oracle.extract_document(d["doc_id"], d["spans"])
        g = golden[d["doc_id"]]
        assert (err is None) == (g["error"] is None), d["doc_id"]
        assert _tuples(out) == g["spans"], d["doc_id"]


def test_kernel_matches_goldens(golden, matrix):
    for d in matrix:
        out, err = kernel.extract_document_rows(d["doc_id"], d["spans"])
        g = golden[d["doc_id"]]
        assert (err is None) == (g["error"] is None), d["doc_id"]
        assert _tuples(out) == g["spans"], d["doc_id"]


def test_kernel_matches_oracle_on_random_docs():
    # fresh docs outside the golden matrix, different seed
    for d in fixtures.random_docs(30, seed=7, prefix="rnd"):
        k, ke = kernel.extract_document_rows(d["doc_id"], d["spans"])
        o, oe = oracle.extract_document(d["doc_id"], d["spans"])
        assert (ke is None) == (oe is None), d["doc_id"]
        assert _tuples(k) == _tuples(o), d["doc_id"]


def test_offsets_are_dense(matrix):
    for d in matrix:
        out, err = kernel.extract_document_rows(d["doc_id"], d["spans"])
        if err is None:
            assert [s["offset"] for s in out] == list(range(len(out))), d["doc_id"]
