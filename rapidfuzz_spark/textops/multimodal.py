"""Multimodal columns: opaque ``binary`` payloads + typed metadata, with
decode / feature-extraction / resize / frame-sampling as Arrow-batched
pandas transforms over ``mapInPandas``.

The *plumbing* is real — schemas, partitioning, Arrow batch shapes, UDF
signatures — but the codec step is a STUB: the container has no
image/audio libraries, so ``decode_media`` derives deterministic fake
metadata from the payload bytes (documented formulas below, so an
engine-independent oracle can verify the full plumbing end to end), and
``real_decode`` raises NotImplementedError where PIL/ffmpeg would plug in.

At scale: media payloads dominate bytes, so every transform here is
``mapInPandas`` (narrow, no shuffle); partition sizing comes from
spark.sql.files.maxPartitionBytes on the scan, and the derived metadata
table is a skinny projection you aggregate/join instead of the blobs.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)


def media_spans(docs: DataFrame) -> DataFrame:
    """Explode the non-text spans of an interleaved document table into a
    media table (doc_id, offset, kind, media_ref) — spans untouched."""
    return docs.select(
        "doc_id", F.explode("spans").alias("s")
    ).where(F.col("s.kind") != "text").select(
        "doc_id",
        F.col("s.offset").alias("offset"),
        F.col("s.kind").alias("kind"),
        F.col("s.media_ref").alias("media_ref"),
    )


def with_payload(media: DataFrame, ref_col: str = "media_ref") -> DataFrame:
    """Attach the opaque binary payload. Sandbox: a deterministic fake
    (the 16 md5 bytes of the ref); deployment: an object-store fetch via
    mapInPandas with the same (…, payload: binary) output schema."""
    return media.withColumn("payload", F.unhex(F.md5(ref_col)))


def real_decode(payload: bytes, kind: str):
    """Where PIL / torchaudio / ffmpeg would decode the payload."""
    raise NotImplementedError(
        "codec libraries are not available in this environment; "
        "decode_media uses the deterministic stub instead"
    )


def decode_media(media: DataFrame, batch_size_hint: int = 0) -> DataFrame:
    """Arrow-batched 'decode': (doc_id, kind, media_ref, payload) ->
    typed metadata. STUB formulas (little-endian on md5 payload bytes,
    engine-portable):

        width       = 16 + (b0*256 + b1) % 1920
        height      = 16 + (b2*256 + b3) % 1080
        n_frames    = 1  + (b4*256 + b5) % 300   (1 for images)
        duration_ms = n_frames * 33              (0 for images)
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # per-row views, NOT a (n, -1) reshape of the concatenated
            # bytes: real payloads are variable-length, and a reshape
            # either throws or silently re-slices bytes across rows
            payloads = [
                np.frombuffer(p, dtype=np.uint8) for p in pdf["payload"]
            ]
            n_bytes = np.fromiter(
                (len(p) for p in payloads), dtype=np.int64, count=len(payloads)
            )
            # first 6 bytes drive the stub formulas (payloads shorter than
            # 6 bytes are zero-padded)
            head = np.zeros((len(payloads), 6), dtype=np.int64)
            for i, p in enumerate(payloads):
                k = min(6, len(p))
                head[i, :k] = p[:k]
            b = head
            width = 16 + (b[:, 0] * 256 + b[:, 1]) % 1920
            height = 16 + (b[:, 2] * 256 + b[:, 3]) % 1080
            frames = 1 + (b[:, 4] * 256 + b[:, 5]) % 300
            is_img = (pdf["kind"] == "image").to_numpy()
            frames = np.where(is_img, 1, frames)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes,
                    "width": width,
                    "height": height,
                    "n_frames": frames,
                    "duration_ms": np.where(is_img, 0, frames * 33),
                }
            )

    return media.mapInPandas(decode, schema=META_SCHEMA)


FEAT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def byte_histogram_features(media: DataFrame, n_bins: int = 16) -> DataFrame:
    """'Feature extraction' stub: L1-normalized byte histogram of the
    payload — the vectorized-batch shape a real embedding model (resize ->
    tensor -> forward pass) would use, minus the model."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # per-row views (variable-length payloads; see decode_media),
            # and clip the bin index: when n_bins does not divide 256 the
            # top byte values would overflow into an (n_bins+1)-th bin
            width = max(1, 256 // n_bins)
            hist = np.stack(
                [
                    np.bincount(
                        np.minimum(
                            np.frombuffer(p, dtype=np.uint8) // width,
                            n_bins - 1,
                        ),
                        minlength=n_bins,
                    )
                    for p in pdf["payload"]
                ]
            ).astype(np.float64)
            # zero-length payloads: keep an all-zero feature, not NaN
            sums = hist.sum(axis=1, keepdims=True)
            hist /= np.where(sums == 0, 1.0, sums)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "feature": list(hist),
                }
            )

    return media.mapInPandas(feats, schema=FEAT_SCHEMA)


def sample_frames(decoded: DataFrame, every_n: int = 30) -> DataFrame:
    """(doc_id, media_ref, frame_idx): deterministic frame sampling for
    video/audio — a pure built-in posexplode over a sequence, no UDF."""
    return decoded.where(F.col("n_frames") > 1).select(
        "doc_id",
        "media_ref",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
