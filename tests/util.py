"""Test helpers: canonical span-sequence comparison (BASELINE.json invariant:
exact equality on (kind, text, media_ref, order) per document)."""

from __future__ import annotations


def spans_key(rows) -> dict[str, list[tuple]]:
    """rows: iterable with .doc_id/.spans_out (Spark Rows) or dicts."""
    out = {}
    for r in rows:
        d = r if isinstance(r, dict) else r.asDict(recursive=True)
        spans = d.get("spans_out") or []
        out[d["doc_id"]] = [
            (s["kind"], s["text"], s["media_ref"], s["order"]) for s in spans
        ]
    return out


def assert_span_equal(actual: dict, golden: dict):
    assert set(actual) == set(golden), (
        f"doc_id sets differ: only_actual={sorted(set(actual)-set(golden))[:5]} "
        f"only_golden={sorted(set(golden)-set(actual))[:5]}"
    )
    bad = [k for k in golden if actual[k] != golden[k]]
    if bad:
        k = bad[0]
        raise AssertionError(
            f"{len(bad)} docs mismatch; first={k}\n actual={actual[k][:6]}\n golden={golden[k][:6]}"
        )
