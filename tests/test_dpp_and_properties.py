"""Dynamic partition pruning evidence + hypothesis-style property tests
for the prefix-filter similarity join's losslessness claim."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """A join on the partition column of a partitioned table with a
    selective dim side must plan a dynamicpruning subquery on the scan —
    the mechanism that turns a 100 TB fact scan into reading only the
    partitions the dim actually references."""
    fact_path = str(tmp_path / "fact")
    spark.range(50_000).select(
        (F.col("id") % 20).alias("pk"), F.col("id").alias("v")
    ).write.partitionBy("pk").parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    dim = spark.range(3).select(
        F.col("id").alias("pk"), F.lit("x").alias("d")
    ).where(F.col("pk") < 3)
    out = fact.join(dim, "pk")
    plan = out._jdf.queryExecution().explainString(
        out._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "dynamicpruning" in plan.lower(), plan[:1500]
    assert len(out.collect()) == 50_000 * 3 // 20


def _jaccard(a: set, b: set) -> float:
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter) if (a or b) else 0.0


def test_prefix_filter_lossless_on_random_corpora(spark):
    """Property: the PPJoin prefix-filter query returns EXACTLY the pairs
    a naive all-pairs Jaccard >= 0.5 finds, on randomized corpora that
    are FORCED to contain true near-duplicate pairs (seeded base docs
    with one-token mutations) — so the recall half of losslessness is
    actually exercised, plus unrelated docs for the precision half."""
    from openmaptiles_zh_modifier_spark import queries_dedup as qd
    from openmaptiles_zh_modifier_spark.registry import clear_frame_cache

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(40)]
    for trial in range(3):
        docs, i = [], 0
        # 5 families of near-duplicates (guaranteed high-Jaccard pairs)
        for _ in range(5):
            base = [rng.choice(vocab) for _ in range(rng.randint(8, 14))]
            for _ in range(rng.randint(2, 3)):
                copy = list(base)
                copy[rng.randrange(len(copy))] = rng.choice(vocab)
                docs.append((i, " ".join(copy)))
                i += 1
        # unrelated noise docs
        for _ in range(10):
            docs.append(
                (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 12))))
            )
            i += 1

        def sh(text):
            t = text.split(" ")
            return {" ".join(t[j : j + 3]) for j in range(len(t) - 2)}

        want = set()
        for (ia, ta), (ib, tb) in itertools.combinations(docs, 2):
            sa, sb = sh(ta), sh(tb)
            if sa and sb:
                inter = len(sa & sb)
                if 2 * inter >= len(sa) + len(sb) - inter:
                    want.add((ia, ib))
        assert want, "trial must generate true near-dup pairs"

        df = spark.createDataFrame(docs, "doc_id long, text string")
        orig = qd.load
        qd.load = lambda s, d, t: df
        clear_frame_cache()  # memo keys include sf_dir; isolate each trial
        try:
            got = {
                (r.doc_a, r.doc_b)
                for r in qd.q_dedup_prefix_filter(
                    spark, f"trial{trial}"
                ).collect()
            }
        finally:
            qd.load = orig
            clear_frame_cache()
        assert got == want, (trial, got ^ want)


def test_hstore_text_roundtrip_property(spark):
    """parse(serialize(m)) == m for randomized maps over an adversarial
    alphabet (quotes, backslashes, '=>', ', ', NULL values, hstore-ish
    keys) — the serializer map_to_hstore_text and the parser
    hstore_text_to_map must be exact inverses, because the JDBC staging
    path writes with one and the next run's discovery reads with the
    other."""
    from openmaptiles_zh_modifier_spark.plans.pipeline import (
        hstore_text_to_map,
        map_to_hstore_text,
    )

    rng = random.Random(20260813)
    # 'NULL' is in the alphabet on purpose: values containing the literal
    # text '=>NULL' (e.g. '=>NULL', 'x, "k"=>NULL') are the adversarial
    # case for the parser's unquoted-NULL sentinel — it must fire only at
    # separator positions, never inside a quoted value
    alphabet = ['a', 'z', '"', '\\', '=>', ', ', "'", ':', '名', ' ', 'NULL']

    def rand_str():
        return "".join(
            rng.choice(alphabet) for _ in range(rng.randrange(0, 8))
        )

    cases = []
    for i in range(60):
        m = {}
        for _ in range(rng.randrange(0, 5)):
            # keys must be unique and non-empty-ish; hstore allows any text
            k = rand_str() + f"#{len(m)}"
            m[k] = None if rng.random() < 0.25 else rand_str()
        cases.append((i, m))

    df = spark.createDataFrame(
        cases, "i int, m map<string,string>"
    )
    out = {
        r.i: r.back
        for r in df.select(
            "i",
            hstore_text_to_map(map_to_hstore_text(F.col("m"))).alias("back"),
        ).collect()
    }
    for i, m in cases:
        assert out[i] == m, (i, m, out[i])
