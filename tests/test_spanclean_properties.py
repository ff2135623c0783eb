"""Property test for exact repeated-span removal: on ARBITRARY small
corpora over a 3-symbol alphabet (forcing heavy span collisions — runs
of repeats, shared prefixes/suffixes, whole-doc duplicates, docs shorter
than K), the Spark plan must agree exactly with a pure-Python reference
implementation of the symmetric ExactSubstr semantics.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

K = 3  # span width for the property run (denser collisions than 8)


def _ref_clean(docs: list[list[str]], k: int) -> dict[int, tuple[int, int, str]]:
    spans: dict[tuple[str, ...], set[int]] = {}
    for did, toks in enumerate(docs):
        for j in range(len(toks) - k + 1):
            spans.setdefault(tuple(toks[j : j + k]), set()).add(did)
    dup = {s for s, ds in spans.items() if len(ds) > 1}
    out = {}
    for did, toks in enumerate(docs):
        covered: set[int] = set()
        for j in range(len(toks) - k + 1):
            if tuple(toks[j : j + k]) in dup:
                covered.update(range(j, j + k))
        kept = [t for i, t in enumerate(toks) if i not in covered]
        out[did] = (len(toks), len(covered), " ".join(kept))
    return out


token = st.sampled_from(["a", "b", "ab"])
doc = st.lists(token, min_size=1, max_size=12)
corpus = st.lists(doc, min_size=1, max_size=6)


@settings(max_examples=12, deadline=None)
@given(corpus)
def test_span_clean_matches_reference(spark, docs):
    from openmaptiles_zh_modifier_spark.queries_text import (
        substring_clean_frame,
    )

    frame = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in substring_clean_frame(frame, k=K).collect()
    }
    assert got == _ref_clean(docs, K)
