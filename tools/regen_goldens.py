"""Regenerate every committed golden file from the ORACLE (never the
Spark kernel — the two are intentionally independent implementations of
freki_spark/spec.py; see CLAUDE.md invariants).

Deterministic: running this on an unchanged tree must produce a zero
git diff (that property is how spec changes are validated — a
behavior-preserving generalization regenerates byte-identical goldens
for all pre-existing fixtures).

Writes:
  tests/golden/fixture_goldens.json  — per-doc {error, spans} (oracle)
  tests/golden/fixture_spans.jsonl   — flat span rows (oracle, non-error docs)
  tests/golden/fixture_inputs.jsonl  — input span inventory (pure python)
  tests/golden/html_goldens.json     — per-doc {error, spans} (html oracle)
  tests/golden/html_spans.jsonl      — flat html span rows

Usage: python tools/regen_goldens.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from freki_spark import fixtures, html_oracle, oracle  # noqa: E402

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden"
)


def _spans_tuples(out: list[dict]) -> list[list]:
    return [[s["kind"], s["text"], s["media_ref"], s["offset"]] for s in out]


def main() -> int:
    # file-order conventions match the originally committed goldens:
    # the *_goldens.json dicts and fixture_spans.jsonl are sorted by
    # doc_id; fixture_inputs.jsonl and html_spans.jsonl keep fixture-
    # matrix order; the .json files have no trailing newline.
    matrix = fixtures.fixture_matrix()
    results = {
        d["doc_id"]: oracle.extract_document(d["doc_id"], d["spans"]) for d in matrix
    }
    goldens = {
        doc_id: {"error": err, "spans": _spans_tuples(out)}
        for doc_id, (out, err) in sorted(results.items())
    }
    span_rows = [
        {
            "doc_id": doc_id,
            "kind": s["kind"],
            "text": s["text"],
            "media_ref": s["media_ref"],
            "offset": s["offset"],
        }
        for doc_id, (out, _err) in sorted(results.items())
        for s in out
    ]
    input_rows = [
        {
            "doc_id": d["doc_id"],
            "pos": pos,
            "kind": s["kind"],
            "text_len": len(s["text"]),
            "media_ref": s["media_ref"],
        }
        for d in matrix
        for pos, s in enumerate(d["spans"])
    ]

    with open(os.path.join(GOLDEN_DIR, "fixture_goldens.json"), "w") as f:
        json.dump(goldens, f, indent=0)
    with open(os.path.join(GOLDEN_DIR, "fixture_spans.jsonl"), "w") as f:
        for r in span_rows:
            f.write(json.dumps(r) + "\n")
    with open(os.path.join(GOLDEN_DIR, "fixture_inputs.jsonl"), "w") as f:
        for r in input_rows:
            f.write(json.dumps(r) + "\n")

    hmatrix = fixtures.html_fixture_matrix()
    hresults = {
        d["doc_id"]: html_oracle.extract_document(d["doc_id"], d["spans"])
        for d in hmatrix
    }
    hgoldens = {
        doc_id: {"error": err, "spans": _spans_tuples(out)}
        for doc_id, (out, err) in sorted(hresults.items())
    }
    hrows = [
        {
            "doc_id": d["doc_id"],
            "kind": s["kind"],
            "text": s["text"],
            "media_ref": s["media_ref"],
            "offset": s["offset"],
        }
        for d in hmatrix
        for s in hresults[d["doc_id"]][0]
    ]
    with open(os.path.join(GOLDEN_DIR, "html_goldens.json"), "w") as f:
        json.dump(hgoldens, f, indent=1)
    with open(os.path.join(GOLDEN_DIR, "html_spans.jsonl"), "w") as f:
        for r in hrows:
            f.write(json.dumps(r) + "\n")

    print(
        f"wrote {len(goldens)} xml docs / {len(span_rows)} spans, "
        f"{len(hgoldens)} html docs / {len(hrows)} spans"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
