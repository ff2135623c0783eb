"""Round-8 operator property tests: the multi-round unigram trainer."""

from __future__ import annotations

from pyspark.sql import functions as F

from openmaptiles_zh_modifier_spark.queries_trainprep import (
    UNI_BIGRAMS,
    UNI_PRUNE_KS,
    UNI_TOP_OUT,
    unigram_train_rounds,
)


def _totals(rounds):
    return [
        r[1].agg(F.sum(F.col("wc") * F.col("cost"))).collect()[0][0]
        for r in rounds
    ]


def test_unigram_em_monotone_without_pruning(spark, sf_dir):
    """Hard-EM guarantee: with the inventory cap left at the initial
    size (no real pruning pressure), total corpus Viterbi cost is
    non-increasing across rounds — the M-step's empirical costs can only
    lower the cost of the fixed segmentation, and re-segmenting can only
    lower it further. Small slack absorbs the integer micro-rounding and
    the count-1 coverage floor (both bounded per piece)."""
    rounds = unigram_train_rounds(
        spark, sf_dir, ks=(UNI_BIGRAMS, UNI_BIGRAMS)
    )
    t1, t2, t3 = _totals(rounds)
    slack = 10_000  # micro-units over a ~1e11 total: noise floor
    assert t2 <= t1 + slack, (t1, t2)
    assert t3 <= t2 + slack, (t2, t3)


def test_unigram_pruning_shrinks_inventory_keeps_coverage(spark, sf_dir):
    """With real pruning (16, 12): the multi-char inventory shrinks to
    the caps, every corpus character survives every round (coverage),
    and surviving multi pieces are always a subset of the previous
    round's inventory (pruning never invents pieces)."""
    rounds = unigram_train_rounds(spark, sf_dir, ks=UNI_PRUNE_KS)
    multis = [
        {r.p for r in pc.where(F.length("p") >= 2).select("p").collect()}
        for pc, _s, _m in rounds
    ]
    chars = [
        {r.p for r in pc.where(F.length("p") == 1).select("p").collect()}
        for pc, _s, _m in rounds
    ]
    assert len(multis[0]) <= UNI_BIGRAMS
    assert len(multis[1]) <= UNI_PRUNE_KS[0]
    assert len(multis[2]) <= UNI_PRUNE_KS[1]
    assert multis[1] <= multis[0] and multis[2] <= multis[1]
    assert chars[0] == chars[1] == chars[2] and len(chars[0]) > 0
    # pruning is allowed to RAISE total cost (it removes used pieces) —
    # pin that the trade happened at all on this fixture so the test
    # would catch a prune that silently stopped pruning
    t = _totals(rounds)
    assert t[1] <= t[0] + 10_000


def test_unigram_train3_output_shape(spark, sf_dir):
    from openmaptiles_zh_modifier_spark.registry import QUERIES

    out = QUERIES["q_unigram_train3"](spark, sf_dir).collect()
    assert len(out) == UNI_TOP_OUT
    assert [r.rk for r in out] == list(range(1, UNI_TOP_OUT + 1))
    counts = [r.new_count for r in out]
    assert counts == sorted(counts, reverse=True)


def test_wordpiece_unk_voids_whole_word(spark, sf_dir):
    """The excluded rarest continuation char voids whole words to
    [UNK] (the WordPiece rule) — [UNK] must appear in the full piece
    counts, and no partial pieces of a voided word may leak."""
    from openmaptiles_zh_modifier_spark.registry import QUERIES

    out = QUERIES["q_tokenize_wordpiece"](spark, sf_dir).collect()
    assert len(out) == 20
    assert [r.rk for r in out] == list(range(1, 21))
    cnts = [r.cnt for r in out]
    assert cnts == sorted(cnts, reverse=True)
    # every non-first-rank piece is either a start piece or ##-marked
    for r in out:
        assert r.piece == "[UNK]" or not r.piece.startswith("###")


def test_phash_brightness_invariance_and_sensitivity():
    """The theorem the oracle states: constant brightness shifts never
    move the hash (DC-only change, median excludes DC); different
    patterns at the same dims DO move it (the hash is not trivial)."""
    from openmaptiles_zh_modifier_spark.functions.multimodal import (
        encode_ppm_pattern,
        phash64,
    )

    for (w, h, p) in [(16, 16, 0), (32, 16, 1), (16, 32, 2), (32, 32, 0)]:
        hashes = {phash64(encode_ppm_pattern(w, h, p, s)) for s in range(0, 51, 7)}
        assert len(hashes) == 1, (w, h, p)
    # sensitivity: the three patterns at one resolution are distinct
    vals = {phash64(encode_ppm_pattern(32, 32, p, 0)) for p in (0, 1, 2)}
    assert len(vals) == 3


def test_scene_cut_closed_form():
    from openmaptiles_zh_modifier_spark.functions.multimodal import (
        decode_y4m_frames,
        encode_y4m_scenes,
    )

    frames = decode_y4m_frames(encode_y4m_scenes(4, 3, 11, 3, 250))
    means = [f["frame_sum"] // 36 for f in frames]
    cuts = [i for i in range(1, 11) if means[i] != means[i - 1]]
    assert cuts == [3, 6, 9]  # every scene_len frames
    assert means[0] == 250 and means[3] == (250 + 37) % 256


def test_wav_vad_frame_energies():
    """Silence frames decode to exactly zero energy; speech frames to
    positive energy — the flag the distributed islands pass keys on."""
    import struct

    import numpy as np

    from openmaptiles_zh_modifier_spark.functions.multimodal import (
        encode_wav_vad,
    )

    payload = encode_wav_vad(14, 5)
    at = payload.index(b"data") + 8
    samples = np.frombuffer(payload, dtype="<i2", count=14 * 256, offset=at)
    for j in range(14):
        e = int(
            (samples[j * 256 : (j + 1) * 256].astype(np.int64) ** 2).sum()
        )
        assert (e > 0) == ((j + 5) % 7 < 4), j


def test_phash64_is_signed_two_complement_long():
    # ADVICE r8 #4: the hash accumulates in Python ints (no int64 wrap at
    # bit 63) and is stored as the SIGNED reinterpretation a Spark long
    # column holds; the unsigned view round-trips through the mask
    from openmaptiles_zh_modifier_spark.functions.multimodal import (
        encode_ppm_pattern,
        phash64,
    )

    for p in (0, 1, 2):
        for s in (0, 7, 21):
            v = phash64(encode_ppm_pattern(32, 32, p, s))
            assert -(1 << 63) <= v < (1 << 63)
            u = v & ((1 << 64) - 1)
            assert (u - (1 << 64) if u >= (1 << 63) else u) == v


def test_mixture_threshold_rounds_identically_across_engines(spark):
    # ADVICE r8 #1: round-to-nearest BEFORE the integer cast on both
    # engines. Sweep 6-dp keep_rates incl. ones whose *1e6 double sits
    # one ulp below the integer (0.070001*1e6 = 70000.99999999999).
    import duckdb
    from pyspark.sql import functions as F

    rates = [round(k / 1000000, 6) for k in range(69995, 70006)] + [
        0.286601,
        0.823441,
        1.0,
    ]
    df = spark.createDataFrame([(r,) for r in rates], "keep_rate double")
    got = [
        r.t
        for r in df.select(
            F.round(F.col("keep_rate") * 1000000).cast("long").alias("t")
        ).collect()
    ]
    want = [
        duckdb.sql(
            f"SELECT CAST(ROUND(CAST({r!r} AS DOUBLE) * 1000000) AS BIGINT)"
        ).fetchone()[0]
        for r in rates
    ]
    assert got == want


def test_edit_distance_cap_is_observable(spark, tmp_path):
    # VERDICT r8 #4: celebrity-prefix blocks over ED_BLOCK_CAP are shed,
    # and the shed is REPORTED — a source whose every block was skipped
    # still gets a row (zero pairs, null distances, non-zero shed counts)
    from openmaptiles_zh_modifier_spark.queries_dedup import (
        ED_BLOCK_CAP,
        q_dedup_edit_distance,
    )

    rows = []
    # source "celeb": one block of CAP+2 docs sharing an 8-char prefix
    for i in range(ED_BLOCK_CAP + 2):
        rows.append((i, "celeb", f"PREFIX00 body {i}"))
    # source "ok": one 2-doc block -> 1 candidate pair
    rows.append((1000, "ok", "OKOKOKOK tail a"))
    rows.append((1001, "ok", "OKOKOKOK tail b"))
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = {
        r.source: r
        for r in q_dedup_edit_distance(spark, str(tmp_path)).collect()
    }
    celeb, ok = out["celeb"], out["ok"]
    assert celeb.n_candidate_pairs == 0 and celeb.min_d is None
    assert celeb.n_blocks_skipped == 1
    assert celeb.n_docs_in_skipped_blocks == ED_BLOCK_CAP + 2
    assert ok.n_candidate_pairs == 1 and ok.n_blocks_skipped == 0
