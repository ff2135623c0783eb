"""Multimodal column support: opaque ``binary`` payloads + typed metadata,
decoded/feature-extracted via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is a
deterministic fake (clearly marked) — but everything Spark-side is real and
tested: the binary column, the metadata struct, the mapInPandas signature,
the Arrow batch shape, and the partition behavior. Swapping the fake for
``real_decode_image`` (PIL/libvips/ffmpeg) changes one function body and
nothing in the plan.

Scale notes: mapInPandas streams Arrow record batches — peak memory is one
batch, not one partition; binary payloads never round-trip through Python
row objects. Feature extraction is embarrassingly parallel; keep payloads
under ``spark.sql.execution.arrow.maxRecordsPerBatch`` sizing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, source string, n_bytes long, width int, height int, "
    "n_frames int, aspect double"
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload column + metadata struct.

    In production the payload arrives from the lake (image/audio bytes in a
    parquet binary column); here it's the UTF-8 encoding of the text column
    — real bytes, deterministic, schema-identical to the production shape.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit("fake/raw").alias("content_type"),
        F.octet_length(payload).alias("n_bytes"),
    )
    return df.withColumn("payload", payload).withColumn("media_meta", meta)


def real_decode_image(payload: bytes) -> dict:
    """The production decode hook. STUB: codecs are not installed in this
    environment — wire PIL/libvips here in a real deployment."""
    raise NotImplementedError(
        "image decode requires a codec library (PIL/libvips); "
        "use fake_decode_features for deterministic testing"
    )


def _fake_features(n_bytes: pd.Series) -> pd.DataFrame:
    """Deterministic fake decode: pseudo width/height/frame-count derived
    from payload size (stands in for real codec output; integer math so the
    DuckDB oracle can recompute it exactly)."""
    width = (n_bytes % 64 + 1).astype("int32")
    height = (n_bytes * 7 % 64 + 1).astype("int32")
    n_frames = (n_bytes % 16 + 1).astype("int32")
    return pd.DataFrame(
        {
            "width": width,
            "height": height,
            "n_frames": n_frames,
            # unrounded: numpy rounds half-even, SQL engines half-away —
            # rounding happens once, at the aggregate, on the JVM side
            "aspect": width / height,
        }
    )


def decode_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over the binary payload column.

    The iterator-of-batches signature is the real multimodal plumbing:
    each Arrow batch arrives as a pandas frame with a bytes-typed payload
    column; features are computed vectorized and the payload is dropped
    before returning (never ship payload bytes past the decode stage).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(len).astype("int64")
            feats = _fake_features(n_bytes)
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "source": pdf["source"],
                    "n_bytes": n_bytes,
                }
            )
            yield pd.concat([out, feats], axis=1)

    return df.mapInPandas(extract, schema=DECODED_SCHEMA)


FRAME_SCHEMA = "doc_id long, source string, frame_idx long, frame_hash long"


def sample_frames(df: DataFrame, stride: int = 4) -> DataFrame:
    """Frame sampling over the binary payload: every ``stride``-th frame of
    each (fake-decoded) video payload becomes one output row with a
    deterministic per-frame fingerprint.

    This is the 1->N explode shape of real video frame extraction
    (ffmpeg -vf select) as an Arrow-batched ``mapInPandas``: input batches
    of payload rows, output batches of frame rows, payload bytes dropped at
    the boundary. Frame count derives from payload size with the same
    integer math as ``_fake_features`` so the DuckDB oracle can recompute
    it; a real deployment swaps the body for codec calls and keeps the
    plan, schema, and partitioning unchanged.
    """
    import numpy as np

    def explode_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            n_bytes = pdf["payload"].map(len).astype("int64").to_numpy()
            n_frames = n_bytes % 16 + 1
            reps = -(-n_frames // stride)  # ceil: frames sampled per doc
            idx = np.concatenate(
                [np.arange(0, n, stride, dtype="int64") for n in n_frames]
            )
            nb_rep = np.repeat(n_bytes, reps)
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(pdf["doc_id"].to_numpy(), reps),
                    "source": np.repeat(pdf["source"].to_numpy(), reps),
                    "frame_idx": idx,
                    "frame_hash": (nb_rep * 31 + idx * 7919) % 1000003,
                }
            )

    return df.mapInPandas(explode_frames, schema=FRAME_SCHEMA)


THUMB_SCHEMA = (
    "doc_id long, width int, height int, thumb_w int, thumb_h int,"
    " thumb_bytes long"
)


def resize_thumbnail(df: DataFrame, max_side: int = 32) -> DataFrame:
    """Thumbnail resize over the binary payload: each (fake-decoded) image
    is scaled to fit ``max_side`` preserving aspect ratio with integer
    floor math, and the "resized" payload is the corresponding byte slice
    (a real deployment swaps in PIL/libvips and keeps the plan shape).
    Output carries source + target dims and the thumbnail byte count;
    payload bytes are dropped at the stage boundary as always.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(len).astype("int64")
            w = (n_bytes % 64 + 1).astype("int64")
            h = (n_bytes * 7 % 64 + 1).astype("int64")
            # fit the long side to max_side, floor-scale the short side
            long_side = w.where(w >= h, h)
            tw = (w * max_side // long_side).clip(lower=1)
            th = (h * max_side // long_side).clip(lower=1)
            thumb = (tw * th).where(tw * th < n_bytes, n_bytes)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w.astype("int32"),
                    "height": h.astype("int32"),
                    "thumb_w": tw.astype("int32"),
                    "thumb_h": th.astype("int32"),
                    "thumb_bytes": thumb,
                }
            )

    return df.mapInPandas(resize, schema=THUMB_SCHEMA)
