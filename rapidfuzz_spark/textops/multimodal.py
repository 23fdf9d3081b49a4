"""Multimodal columns: opaque ``binary`` payloads + typed metadata, with
decode / feature-extraction / frame-sampling as Arrow-batched pandas
transforms over ``mapInPandas``.

``decode_media`` is a REAL container parser: it reads the payload bytes
with ``struct`` — PNG signature + IHDR (width/height), RIFF/WAVE fmt +
data chunks (byte rate -> duration), RIFF/AVI hdrl/avih (frame count,
frame duration, dimensions) — walking chunks the way any header-level
probe (ffprobe, PIL ``.size``) does. Full sample/pixel decoding would
need codec libraries this container doesn't ship; everything a metadata
pipeline consumes (dimensions, duration, frame count, byte size,
container type) comes from the actual bytes.

``with_payload`` is the sandbox fixture: it synthesizes valid container
files whose header fields derive from md5 of the media ref, built as a
pure-Catalyst hex expression (``unhex`` of concatenated hex) so an
independent SQL engine can reconstruct the exact payload bytes and verify
both the parser and the byte-histogram features end to end. In
deployment it is replaced by an object-store fetch with the same
(…, payload: binary) schema. Synthesized checksums (PNG CRC) are zero —
the parser, like most probes, does not validate checksums.

At scale: media payloads dominate bytes, so every transform here is
``mapInPandas`` (narrow, no shuffle); partition sizing comes from
spark.sql.files.maxPartitionBytes on the scan, and the derived metadata
table is a skinny projection you aggregate/join instead of the blobs.
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("container", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

# audio "frame" = one 33 ms window (30 fps alignment so frame sampling
# treats audio and video uniformly)
_AUDIO_FRAME_MS = 33


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


# ---- fixture payload synthesis (valid container headers) ------------------


def _le_hex(c: Column, n: int) -> Column:
    """Little-endian fixed-width hex of an integer Column (n bytes)."""
    parts = [
        F.lpad(
            F.lower(F.hex(F.shiftright(c.cast("long"), 8 * i).bitwiseAND(F.lit(255)))),
            2,
            "0",
        )
        for i in range(n)
    ]
    return F.concat(*parts)


def _be_hex(c: Column, n: int) -> Column:
    """Big-endian fixed-width hex of an integer Column (n bytes)."""
    return F.lpad(F.lower(F.hex(c.cast("long"))), 2 * n, "0")


def with_payload(media: DataFrame, ref_col: str = "media_ref") -> DataFrame:
    """Attach a synthesized binary payload: a VALID container file per
    ``kind`` — PNG (image), WAV (audio), AVI (video) — whose header
    fields derive from md5(ref) so a SQL oracle can rebuild the exact
    bytes. Deployment replaces this with an object-store fetch keeping
    the same (…, payload: binary) output schema.

    Field derivation from h = md5(ref) hex (little-endian ints):
        width       = 16 + hex(h[0:4])  % 1920
        height      = 16 + hex(h[4:8])  % 1080
        n_frames    = 1  + hex(h[8:12]) % 300   (video/audio; images 1)
        duration_ms = n_frames * 33

    WAV carries duration as a declared data-chunk size at byte_rate 2000
    (data_size = 66 * n_frames); AVI carries it as avih total_frames ×
    33000 µs/frame. Both files are header-complete with a 16-byte body
    (the md5 digest of the ref) in place of the sample/pixel data — the
    declared sizes are authoritative for a header-level parser.
    """
    h = F.md5(F.col(ref_col))

    def hx(pos: int) -> Column:  # 4 hex chars at 1-based pos -> long
        return F.conv(F.substring(h, pos, 4), 16, 10).cast("long")

    w = F.lit(16) + hx(1) % 1920
    ht = F.lit(16) + hx(5) % 1080
    k = F.lit(1) + hx(9) % 300
    data_sz = k * (2 * _AUDIO_FRAME_MS)  # bytes at byte_rate 2000 for 33k ms

    # PNG: signature, IHDR(len 13): width, height, bit depth 8, color
    # type 2 (truecolor), compression/filter/interlace 0, zero CRC, body
    png = F.concat(
        F.lit("89504e470d0a1a0a" "0000000d" "49484452"),
        _be_hex(w, 4),
        _be_hex(ht, 4),
        F.lit("0802000000" "00000000"),
        h,
    )
    # WAV: RIFF size 36+data, fmt(16): PCM, mono, 1000 Hz, byte_rate
    # 2000, block 2, 16-bit; data chunk with declared size, body
    wav = F.concat(
        F.lit("52494646"),
        _le_hex(data_sz + 36, 4),
        F.lit(
            "57415645" "666d7420" "10000000" "0100" "0100"
            "e8030000" "d0070000" "0200" "1000" "64617461"
        ),
        _le_hex(data_sz, 4),
        h,
    )
    # AVI: RIFF size 96, LIST(68) hdrl, avih(56): 33000 µs/frame, three
    # zero dwords, total_frames, initial 0, streams 1, buffer 0, width,
    # height, 4 reserved dwords; body
    avi = F.concat(
        F.lit(
            "52494646" "60000000" "41564920" "4c495354" "44000000"
            "6864726c" "61766968" "38000000" "e8800000"
            + "00" * 12
        ),
        _le_hex(k, 4),
        F.lit("00000000" "01000000" "00000000"),
        _le_hex(w, 4),
        _le_hex(ht, 4),
        F.lit("00" * 16),
        h,
    )
    kind = F.col("kind") if "kind" in media.columns else F.lit("image")
    payload_hex = (
        F.when(kind == "image", png)
        .when(kind == "audio", wav)
        .when(kind == "video", avi)
        .otherwise(h)  # unknown kind: bare 16-byte blob, no container
    )
    return media.withColumn("payload", F.unhex(payload_hex))


# ---- real container parsing ------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def parse_container(p: bytes) -> Tuple[str, int, int, int, int]:
    """Parse a media container's header from its actual bytes:
    (container, width, height, n_frames, duration_ms). Pure-``struct``
    header probe — no codec libraries. Unknown/truncated payloads return
    ('unknown', 0, 0, 0, 0) rather than raising (a corrupt blob in a
    100 TB corpus must not fail the stage)."""
    if p[:8] == _PNG_SIG:
        return _parse_png(p)
    if p[:4] == b"RIFF" and len(p) >= 12:
        fourcc = p[8:12]
        if fourcc == b"WAVE":
            return _parse_wav(p)
        if fourcc == b"AVI ":
            return _parse_avi(p)
    return ("unknown", 0, 0, 0, 0)


def _parse_png(p: bytes) -> Tuple[str, int, int, int, int]:
    # chunk walk: IHDR must come first per spec, but walk defensively
    off = 8
    while off + 8 <= len(p):
        (length,) = struct.unpack(">I", p[off : off + 4])
        ctype = p[off + 4 : off + 8]
        if ctype == b"IHDR" and off + 8 + 8 <= len(p):
            w, h = struct.unpack(">II", p[off + 8 : off + 16])
            return ("png", w, h, 1, 0)
        off += 12 + length  # len + type + data + CRC
    return ("png", 0, 0, 1, 0)


def _riff_chunks(p: bytes, off: int, end: int):
    while off + 8 <= min(end, len(p)):
        cid = p[off : off + 4]
        (sz,) = struct.unpack("<I", p[off + 4 : off + 8])
        yield cid, sz, off + 8
        off += 8 + sz + (sz & 1)  # chunks are word-aligned


def _parse_wav(p: bytes) -> Tuple[str, int, int, int, int]:
    byte_rate = 0
    data_size: Optional[int] = None
    for cid, sz, doff in _riff_chunks(p, 12, len(p)):
        if cid == b"fmt " and doff + 12 <= len(p):
            (byte_rate,) = struct.unpack("<I", p[doff + 8 : doff + 12])
        elif cid == b"data":
            # declared size is authoritative (the sample data itself may
            # be truncated/externalized); stop the walk here
            data_size = sz
            break
    if not byte_rate or data_size is None:
        return ("wav", 0, 0, 0, 0)
    duration_ms = data_size * 1000 // byte_rate
    return ("wav", 0, 0, duration_ms // _AUDIO_FRAME_MS, duration_ms)


def _parse_avi(p: bytes) -> Tuple[str, int, int, int, int]:
    for cid, sz, doff in _riff_chunks(p, 12, len(p)):
        if cid == b"LIST" and p[doff : doff + 4] == b"hdrl":
            for c2, s2, d2 in _riff_chunks(p, doff + 4, doff + sz):
                if c2 == b"avih" and d2 + 40 <= len(p):
                    mpf, _, _, _, total_frames = struct.unpack(
                        "<IIIII", p[d2 : d2 + 20]
                    )
                    w, h = struct.unpack("<II", p[d2 + 32 : d2 + 40])
                    return ("avi", w, h, total_frames, total_frames * mpf // 1000)
    return ("avi", 0, 0, 0, 0)


def decode_media(media: DataFrame, batch_size_hint: int = 0) -> DataFrame:
    """Arrow-batched decode: (doc_id, kind, media_ref, payload) -> typed
    metadata parsed from the payload BYTES (``parse_container``). The
    declared ``kind`` column rides along untouched; ``container`` is what
    the bytes actually are — a mismatch is itself a data-quality signal."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            parsed = [
                parse_container(bytes(p)) if p is not None else ("unknown", 0, 0, 0, 0)
                for p in pdf["payload"]
            ]
            container, width, height, frames, duration = (
                np.array(col) for col in zip(*parsed)
            )
            n_bytes = np.fromiter(
                (0 if p is None else len(p) for p in pdf["payload"]),
                dtype=np.int64,
                count=len(pdf),
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "container": container,
                    "n_bytes": n_bytes,
                    "width": width.astype(np.int64),
                    "height": height.astype(np.int64),
                    "n_frames": frames.astype(np.int64),
                    "duration_ms": duration.astype(np.int64),
                }
            )

    return media.mapInPandas(decode, schema=META_SCHEMA)


FEAT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def byte_histogram_features(media: DataFrame, n_bins: int = 16) -> DataFrame:
    """L1-normalized byte histogram of the payload — the vectorized-batch
    shape a real embedding model (resize -> tensor -> forward pass) would
    use; computed from the actual payload bytes. ``n_bytes`` is emitted so
    callers can recover exact integer counts (feature * n_bytes)."""

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
            n_bytes = hist.sum(axis=1).astype(np.int64)
            # zero-length payloads: keep an all-zero feature, not NaN
            sums = hist.sum(axis=1, keepdims=True)
            hist /= np.where(sums == 0, 1.0, sums)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "n_bytes": n_bytes,
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
