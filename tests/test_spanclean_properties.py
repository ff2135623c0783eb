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


def _ref_boiler(docs: list[list[str]], seg: int, df_max: int):
    segments: dict[int, list[str]] = {}
    for did, toks in enumerate(docs):
        n = -(-len(toks) // seg)
        segments[did] = [
            " ".join(toks[j * seg : (j + 1) * seg]) for j in range(n)
        ]
    dfreq: dict[str, set[int]] = {}
    for did, ss in segments.items():
        for s in ss:
            dfreq.setdefault(s, set()).add(did)
    out = {}
    for did, ss in segments.items():
        kept = [s for s in ss if len(dfreq[s]) <= df_max]
        out[did] = (" ".join(kept), len(kept))
    return out


@settings(max_examples=12, deadline=None)
@given(corpus)
def test_boilerplate_clean_matches_reference(spark, docs):
    from openmaptiles_zh_modifier_spark.queries_text import (
        boilerplate_clean_frame,
    )

    SEG, DF_MAX = 3, 1
    frame = spark.createDataFrame(
        [(i, "s", " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, source string, text string",
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_kept"])
        for r in boilerplate_clean_frame(
            frame, seg_tokens=SEG, df_max=DF_MAX
        ).collect()
    }
    assert got == _ref_boiler(docs, SEG, DF_MAX)
