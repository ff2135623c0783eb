"""Property test for deletion-neighborhood blocking (q_record_linkage's
core): on ARBITRARY equal-length digit strings — not just the fixture's
dense Customer#-names — the blocked candidate join must find exactly the
levenshtein<=1 pairs a brute-force scan finds. Hypothesis drives the
corpus shape (duplicates, clusters, sparse ids) through the same Spark
plan the registered query uses.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

N_DIGITS = 6


def _blocked_pairs(spark, names: list[str]) -> set[tuple[int, int]]:
    """The q_record_linkage plan shape on (key, digit-string) rows."""
    rows = [(i, s) for i, s in enumerate(names)]
    c = spark.createDataFrame(rows, "k long, d string")
    keys = F.array(
        *[
            F.struct(
                F.lit(i).alias("pos"),
                F.concat(
                    F.substring("d", 1, i - 1),
                    F.lit("*"),
                    F.substring("d", i + 1, N_DIGITS - i),
                ).alias("masked"),
            )
            for i in range(1, N_DIGITS + 1)
        ]
    )
    blocked = c.select("k", "d", F.explode(keys).alias("bk")).select(
        "k", "d", "bk.pos", "bk.masked"
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.pos") == F.col("b.pos"))
            & (F.col("a.masked") == F.col("b.masked"))
            & (F.col("a.k") < F.col("b.k")),
        )
        .where(F.levenshtein(F.col("a.d"), F.col("b.d")) <= 1)
        .select(F.col("a.k").alias("ka"), F.col("b.k").alias("kb"))
        .distinct()
        .collect()
    )
    return {(r.ka, r.kb) for r in pairs}


def _brute_pairs(names: list[str]) -> set[tuple[int, int]]:
    out = set()
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            # equal length => lev<=1 iff Hamming<=1
            if sum(x != y for x, y in zip(names[i], names[j])) <= 1:
                out.add((i, j))
    return out


digit_string = st.text(alphabet="0123456789", min_size=N_DIGITS, max_size=N_DIGITS)


@settings(max_examples=8, deadline=None)
@given(st.lists(digit_string, min_size=2, max_size=24))
def test_blocking_is_lossless_on_arbitrary_digit_strings(spark, names):
    assert _blocked_pairs(spark, names) == _brute_pairs(names)
