"""Multimodal column operators (SURVEY §2.10 X5).

Images/audio/video are opaque `binary` payloads with typed metadata structs;
decode/resize/frame-sample run as Arrow-batched mapInPandas stages. The
image/audio codec libraries are NOT in this container (environment contract),
so the decode kernel is a deterministic stub (`_fake_decode`) behind the real
Spark plumbing: schema, binary column handling, batch iteration, and
partition-preserving mapInPandas are all genuine and tested.

Scale notes: binary payloads ride the same parquet scan as everything else;
the mapInPandas stage is a narrow (per-partition) transformation — no
shuffle — and Arrow moves the bytes to Python in columnar batches, not row
at a time. For real codecs the only change is the kernel body.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from onebrc_spark.registry import query
from onebrc_spark.sources.catalog import load_table, spread

# Synthetic media table: documents recast as binary payloads + metadata —
# the return contract of media_table(), asserted there so a drifting select
# cannot silently stale this schema.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("meta", T.StructType([
            T.StructField("n_bytes", T.LongType()),
            T.StructField("source", T.StringType()),
        ])),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
    ]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents recast as a multimodal table: text bytes as the opaque
    payload, typed metadata struct alongside — the storage layout a real
    image/audio dataset uses (payload binary + meta struct per row)."""
    d = load_table(spark, sf_dir, "documents")
    out = d.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.struct(
            F.length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )
    assert {f.name: f.dataType for f in out.schema.fields} == {
        f.name: f.dataType for f in MEDIA_SCHEMA.fields
    }, "media_table drifted from MEDIA_SCHEMA"
    # carry the documents scan's size hint so spread() stays input-adaptive
    out._onebrc_src_bytes = getattr(d, "_onebrc_src_bytes", 0)
    return out


def _fake_decode(
    payload: bytes, media_type: str, with_checksum: bool = True
) -> tuple[int, int, int]:
    """Deterministic stand-in for an image/audio decode kernel.

    Real implementation would be e.g. PIL.Image.open(BytesIO(payload)) —
    unavailable in this container, so derive (width, height, checksum)
    deterministically from the bytes. Raising NotImplementedError here for
    unknown types marks the genuine stub boundary.

    The per-byte Python checksum fold is O(total corpus bytes) in the
    interpreter — by far the stage's dominant CPU — so callers that never
    read the column (mm_decode_stats aggregates only bytes/dimensions)
    pass with_checksum=False and get 0; checksum parity is pinned by its
    own unit test with the fold enabled.
    """
    if media_type not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for media_type={media_type!r}")
    if payload is None:
        # NULL payload (e.g. NULL source text): the item exists but nothing
        # decodes — NULL metadata, so downstream SUM/MIN/MAX skip it exactly
        # like the oracle's octet_length(encode(NULL)) = NULL arithmetic
        return (None, None, None)
    checksum = 0
    if with_checksum:
        for b in payload:
            checksum = (checksum * 131 + b) % 1_000_000_007
    n = len(payload)
    return (n % 640 + 1, n % 480 + 1, checksum)


def decode_media(media: DataFrame, with_checksum: bool = True) -> DataFrame:
    """mapInPandas decode stage: Arrow batches in, decoded metadata out."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                _fake_decode(p, t, with_checksum)
                for p, t in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "checksum": [d[2] for d in decoded],
                }
            )

    return media.mapInPandas(decode_batches, DECODED_SCHEMA)


@query(
    "mm_decode_stats",
    oracle="""
    WITH payloads AS (
      SELECT doc_id AS media_id,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                             ELSE 'video' END AS media_type,
             octet_length(encode(text)) AS n_bytes
      FROM documents
    )
    SELECT media_type,
           count(*) AS n_items,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           CAST(min(n_bytes % 640 + 1) AS INTEGER) AS min_width,
           CAST(max(n_bytes % 480 + 1) AS INTEGER) AS max_height
    FROM payloads GROUP BY media_type ORDER BY media_type
    """,
    survey_ref="X5",
)
def mm_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode pipeline end-to-end: build media table → mapInPandas
    decode (Arrow batches) → aggregate decoded dimensions. The oracle
    reproduces the deterministic fake-decode arithmetic; checksum parity is
    unit-tested (DuckDB can't fold bytes)."""
    # with_checksum=False: this query reads only bytes/dimensions, and the
    # per-byte Python fold would otherwise dominate the stage CPU
    decoded = decode_media(
        spread(media_table(spark, sf_dir), spark), with_checksum=False
    )
    return (
        decoded.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.min("width").alias("min_width"),
            F.max("height").alias("max_height"),
        )
        .orderBy("media_type")
    )


@query(
    "mm_frame_sample",
    oracle="""
    WITH p AS (
      SELECT doc_id AS media_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             greatest(octet_length(encode(text)) // 256, 1) AS n_frames
      FROM documents WHERE doc_id % 3 = 2
    ), frames AS (
      SELECT media_id, n_bytes,
             unnest(generate_series(0, n_frames - 1)) AS frame_no
      FROM p
    )
    SELECT media_id,
           CAST(frame_no AS INT) AS frame_no,
           CAST(least(256, n_bytes - frame_no * 256) AS INT) AS frame_bytes
    FROM frames ORDER BY media_id, frame_no
    """,
    survey_ref="X5",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled 'frame' (every 256-byte
    slice of the payload stands in for a video frame), via posexplode over a
    JVM-computed slice index array — the fan-out shape of real frame
    extraction (row → N frames), with frame bytes sliced JVM-side.

    Oracle: the fan-out is pure arithmetic over byte lengths (media_type
    'video' ⇔ doc_id % 3 = 2, frame count = max(floor(bytes/256), 1)), so
    DuckDB replays it exactly — upgraded from the round-2 rows-only check."""
    media = media_table(spark, sf_dir).filter(F.col("media_type") == "video")
    n_frames = F.greatest(
        (F.length("payload") / 256).cast("int"), F.lit(1)
    )
    return (
        media.select(
            "media_id",
            F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_no", "_"),
            F.length("payload").alias("n_bytes"),
        )
        .select(
            "media_id",
            "frame_no",
            F.least(F.lit(256), F.col("n_bytes") - F.col("frame_no") * 256).alias(
                "frame_bytes"
            ),
        )
        .orderBy("media_id", "frame_no")
    )


FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
        T.StructField("bin_counts", T.ArrayType(T.LongType())),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature-extraction stage: payload bytes → L2-normalized
    16-bin byte histogram (binned by high nibble), as `array<float>`.

    Unlike the decode stub this kernel is fully real — a byte histogram IS a
    legitimate content feature (used for media-type sniffing and corruption
    detection); swapping in a CNN embedding changes only the kernel body,
    not the schema, batching, or downstream similarity ops (the output
    column is the same `array<float>` shape as `embeddings.embedding`).
    """

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats, counts, nbytes = [], [], []
            for payload in pdf["payload"]:
                if payload is None:  # NULL payload → NULL feature row
                    feats.append(None)
                    counts.append(None)
                    nbytes.append(None)
                    continue
                raw = bytes(payload)
                arr = np.frombuffer(raw, dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=FEATURE_DIM)
                histf = hist.astype("float32")
                norm = float(np.linalg.norm(histf))
                feats.append((histf / norm if norm else histf).tolist())
                counts.append(hist.tolist())
                nbytes.append(len(raw))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "features": feats,
                    "bin_counts": counts,
                    "n_bytes": nbytes,
                }
            )

    return media.mapInPandas(feature_batches, FEATURES_SCHEMA)


@query(
    "mm_feature_extract",
    oracle="""
    WITH p AS (
      SELECT doc_id AS media_id,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                             ELSE 'video' END AS media_type,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             -- bytes with high nibble 2 are exactly the codepoints
             -- U+0020..U+002F (space + ASCII punctuation): they are
             -- single-byte in UTF-8 and never occur inside multi-byte
             -- sequences (continuation bytes are >= 0x80).
             CAST(length(text) - length(regexp_replace(text, '[ -/]', '', 'g'))
                  AS BIGINT) AS bin2
      FROM documents
    )
    SELECT media_type,
           count(*) AS n_items,
           CAST(sum(bin2) AS BIGINT) AS sum_bin2,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           TRUE AS all_norm_unit
    FROM p GROUP BY media_type ORDER BY media_type
    """,
    survey_ref="X5 (feature extraction)",
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction pipeline: media table → Arrow-batched histogram
    features (L2-normalized float32) + exact integer bin counts → per-type
    census.

    Oracle strategy (upgraded from the round-2 rows-only check): the checked
    aggregates are EXACT INTEGERS — the count of nibble-2 bytes, which DuckDB
    recomputes as the count of U+0020..U+002F codepoints, and total payload
    bytes — while the float32 normalization is verified as a Spark-side
    tolerance boolean (`all_norm_unit`, same pattern as the HLL sketch
    bands): every feature vector's sum of squares must be within 1e-3 of 1.
    The oracle pins TRUE."""
    feats = extract_features(spread(media_table(spark, sf_dir), spark))
    sumsq = F.aggregate(
        "features", F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")
    )
    return (
        feats.select(
            "media_type",
            F.element_at("bin_counts", 3).alias("bin2"),
            "n_bytes",
            # vacuously true for an empty payload: a zero-length document
            # has a zero histogram (sum of squares 0, unnormalizable), and
            # the oracle's pinned TRUE must survive fixture regenerations
            # that include empty texts (ADVICE r3); likewise NULL payloads
            # (nothing to normalize), so a group of only NULL-text docs
            # still bool_ands to TRUE, matching the oracle's pinned TRUE
            (
                F.col("n_bytes").isNull()
                | (F.col("n_bytes") == 0)
                | (F.abs(sumsq - F.lit(1.0)) < 1e-3)
            ).alias("norm_ok"),
        )
        .groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("bin2").alias("sum_bin2"),
            F.sum("n_bytes").alias("total_bytes"),
            F.bool_and("norm_ok").alias("all_norm_unit"),
        )
        .orderBy("media_type")
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("orig_bytes", T.LongType()),
    ]
)

_RESIZE_TARGET = 1024


def resize_media(media: DataFrame, target: int = _RESIZE_TARGET) -> DataFrame:
    """mapInPandas resize stage: downsample each payload to ≤ `target` bytes
    by stride sampling (every k-th byte, k = ceil(n/target)) — the
    deterministic stand-in for an image resize kernel (PIL.thumbnail etc.,
    not in this container). Emits the resized binary payload itself, so
    downstream stages (decode, feature-extract) compose on the output."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload, orig = [], []
            for payload in pdf["payload"]:
                if payload is None:  # NULL payload → NULL resized row
                    out_payload.append(None)
                    orig.append(None)
                    continue
                b = bytes(payload)
                stride = max(1, -(-len(b) // target))
                out_payload.append(b[::stride])
                orig.append(len(b))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload": out_payload,
                    "orig_bytes": orig,
                }
            )

    return media.mapInPandas(resize_batches, RESIZED_SCHEMA)


@query(
    "mm_resize",
    oracle=f"""
    WITH p AS (
      SELECT doc_id AS media_id,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                             ELSE 'video' END AS media_type,
             octet_length(encode(text)) AS n
      FROM documents
    )
    SELECT media_type,
           count(*) AS n_items,
           CAST(sum(CAST(ceil(n / greatest(1.0, ceil(n / {_RESIZE_TARGET}.0))) AS BIGINT))
             AS BIGINT) AS resized_bytes,
           CAST(sum(n) AS BIGINT) AS orig_bytes
    FROM p GROUP BY media_type ORDER BY media_type
    """,
    survey_ref="X5 (resize/downsample)",
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize pipeline end-to-end, hash-verified: the aggregate measures the
    ACTUAL byte lengths of the payloads the Python kernel emitted, while the
    oracle computes the expected lengths arithmetically (stride sampling:
    len = ceil(n/ceil(n/target))) — so the Arrow binary round trip itself is
    under test, not just the metadata math."""
    resized = resize_media(spread(media_table(spark, sf_dir), spark))
    return (
        resized.select(
            "media_type",
            F.length("payload").cast("long").alias("new_bytes"),
            "orig_bytes",
        )
        .groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("new_bytes").alias("resized_bytes"),
            F.sum("orig_bytes").alias("orig_bytes"),
        )
        .orderBy("media_type")
    )


_BYTESTATS_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("n_spaces", T.LongType()),
        T.StructField("n_newlines", T.LongType()),
    ]
)


def byte_stats_arrow(media: DataFrame) -> DataFrame:
    """mapInArrow byte-scan stage: operates on pyarrow RecordBatches
    directly — no pandas conversion at all, one step lower than mapInPandas.

    The kernel counts target bytes (0x20 space, 0x0A newline) per payload by
    scanning the Arrow binary buffer with numpy: one vectorized pass over
    the raw data buffer plus an offsets-indexed cumsum — zero per-row Python.
    This is the shape a real media pipeline uses for magic-number sniffing,
    corruption scans, or entropy estimation where decoding is overkill.
    """
    import numpy as np
    import pyarrow as pa

    def _per_row_byte_counts(arr: pa.Array, byte: int) -> "np.ndarray":
        # BinaryArray layout: buffers = [validity, int32 offsets, data].
        # Respect arr.offset (the batch may be a slice of a larger array).
        off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
            arr.offset : arr.offset + len(arr) + 1
        ]
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        cum = np.concatenate(([0], np.cumsum(data == byte, dtype=np.int64)))
        return cum[off[1:]] - cum[off[:-1]]

    def batches(it: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
        for b in it:
            pay = b.column(b.schema.get_field_index("payload"))
            off = np.frombuffer(pay.buffers()[1], dtype=np.int32)[
                pay.offset : pay.offset + len(pay) + 1
            ]
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(b.schema.get_field_index("media_type")),
                    pa.array((off[1:] - off[:-1]).astype(np.int64), type=pa.int64()),
                    pa.array(_per_row_byte_counts(pay, 0x20), type=pa.int64()),
                    pa.array(_per_row_byte_counts(pay, 0x0A), type=pa.int64()),
                ],
                names=["media_type", "n_bytes", "n_spaces", "n_newlines"],
            )

    return media.select("media_type", "payload").mapInArrow(
        batches, _BYTESTATS_SCHEMA
    )


@query(
    "mm_byte_stats_arrow",
    oracle="""
    WITH p AS (
      SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                             ELSE 'video' END AS media_type,
             octet_length(encode(text)) AS n_bytes,
             octet_length(encode(text))
               - octet_length(encode(replace(text, ' ', ''))) AS n_spaces,
             octet_length(encode(text))
               - octet_length(encode(replace(text, chr(10), ''))) AS n_newlines
      FROM documents
    )
    SELECT media_type,
           count(*) AS n_items,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           CAST(sum(n_spaces) AS BIGINT) AS total_spaces,
           CAST(sum(n_newlines) AS BIGINT) AS total_newlines
    FROM p GROUP BY media_type ORDER BY media_type
    """,
    survey_ref="X5,U3 (mapInArrow zero-copy byte scan)",
)
def mm_byte_stats_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-native byte scan end-to-end: media table → mapInArrow kernel
    (numpy over the raw Arrow buffers, no pandas) → JVM aggregate. The
    oracle recomputes space/newline byte counts via UTF-8 octet-length
    deltas (both bytes are single-byte in UTF-8, so char-replace deltas
    equal byte counts), pinning the buffer-offset arithmetic exactly."""
    stats = byte_stats_arrow(spread(media_table(spark, sf_dir), spark))
    return (
        stats.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.sum("n_spaces").alias("total_spaces"),
            F.sum("n_newlines").alias("total_newlines"),
        )
        .orderBy("media_type")
    )


# --- X5b: REAL container decode (WAV / BMP, pure-Python parsers) ------------
#
# The generic decode path above stubs its kernel because no codec libraries
# ship in this environment. Uncompressed containers need none: RIFF/WAV and
# BMP headers are fixed-layout structs, so the parsers below are REAL
# decoders (they correctly decode any standard PCM WAV / uncompressed BMP,
# not just the synthesized fixtures). The pipeline synthesizes spec-valid
# files from the documents table, then decodes them by actually walking the
# container structure — upgrading the round-2 "deterministic fake decode"
# to genuine format decoding for the formats that allow it.

CONTAINER_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

DECODED_REAL_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_pixels", T.LongType()),
    ]
)


def _build_wav(samples: bytes, sample_rate: int) -> bytes:
    """Spec-valid PCM16 mono WAV (RIFF container, fmt + data chunks)."""
    import struct

    data = samples[: len(samples) - (len(samples) % 2)]
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def _build_bmp(pixels: bytes, width: int, height: int) -> bytes:
    """Spec-valid 24-bpp bottom-up BMP (BITMAPFILEHEADER+BITMAPINFOHEADER)."""
    import struct

    row = width * 3
    stride = (row + 3) & ~3
    need = stride * height
    body = (pixels * (need // max(len(pixels), 1) + 1))[:need] if pixels else b"\0" * need
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, need, 2835, 2835, 0, 0)
    return (
        b"BM"
        + struct.pack("<IHHI", 14 + 40 + need, 0, 0, 14 + 40)
        + info
        + body
    )


def _build_y4m(pixels: bytes, width: int, height: int, n_frames: int) -> bytes:
    """Spec-valid YUV4MPEG2 (Y4M) stream: plain-text stream header, FRAME
    markers, raw 4:2:0 planar frames — the one video container that needs
    no codec. Dimensions must be even for C420."""
    frame_len = width * height * 3 // 2
    need = frame_len * n_frames
    body = (pixels * (need // max(len(pixels), 1) + 1))[:need] if pixels else b"\0" * need
    header = f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 C420\n".encode()
    out = [header]
    for i in range(n_frames):
        out.append(b"FRAME\n")
        out.append(body[i * frame_len : (i + 1) * frame_len])
    return b"".join(out)


def synthesize_containers(media: DataFrame) -> DataFrame:
    """mapInPandas producer: wrap each payload in a real container format
    (audio → PCM16 WAV at a media_id-derived sample rate; image → 24-bpp
    BMP at byte-length-derived dimensions). Deterministic, so the decode
    oracle can replay the geometry arithmetically."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_type, out_payload = [], [], []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                if payload is None:  # NULL payload → NULL container
                    out_id.append(mid)
                    out_type.append(mtype)
                    out_payload.append(None)
                    continue
                raw = bytes(payload)
                n = len(raw)
                if mtype == "audio":
                    built = _build_wav(raw, 8000 + int(mid) % 8 * 1000)
                elif mtype == "image":
                    built = _build_bmp(raw, n % 64 + 1, n % 48 + 1)
                else:  # video -> Y4M (even dims required by C420)
                    built = _build_y4m(
                        raw, 16 + n % 8 * 2, 12 + n % 6 * 2, 1 + n % 3
                    )
                out_id.append(mid)
                out_type.append(mtype)
                out_payload.append(built)
            yield pd.DataFrame(
                {"media_id": out_id, "media_type": out_type, "payload": out_payload}
            )

    return media.mapInPandas(synth, CONTAINER_SCHEMA)


def decode_wav(buf: bytes) -> tuple[int, int, int]:
    """REAL RIFF/WAV decoder: validates magic, walks chunks, parses fmt,
    returns (channels, sample_rate, n_samples). Raises on malformed input."""
    import struct

    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, channels, rate, bits, n_samples = 12, None, None, None, None
    while pos + 8 <= len(buf):
        cid, size = buf[pos : pos + 4], struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            # the docstring contract is ValueError on ANY malformed input:
            # a truncated fmt chunk must not surface as struct.error, and a
            # zero channel/bit count must not surface as ZeroDivisionError
            # at the data chunk (ADVICE r3)
            if len(body) < 16:
                raise ValueError(f"fmt chunk too short ({len(body)} < 16 bytes)")
            _, channels, rate, _, block, bits = struct.unpack("<HHIIHH", body[:16])
            # rate == 0 would escape as ZeroDivisionError in the duration
            # arithmetic downstream — same hardening as channels/bits
            if channels == 0 or bits == 0 or bits % 8 != 0 or rate == 0:
                raise ValueError(
                    f"bad fmt: channels={channels} bits={bits} rate={rate}"
                )
        elif cid == b"data":
            if channels is None:
                raise ValueError("data chunk before fmt chunk")
            n_samples = len(body) // (channels * bits // 8)
        pos += 8 + size + (size % 2)  # RIFF chunks are word-aligned
    if n_samples is None:
        raise ValueError("no data chunk")
    return channels, rate, n_samples


def decode_bmp(buf: bytes) -> tuple[int, int, int]:
    """REAL BMP decoder: validates magic, parses BITMAPINFOHEADER, returns
    (width, height, bpp). Raises on malformed input."""
    import struct

    if buf[:2] != b"BM":
        raise ValueError("not a BMP file")
    # length check BEFORE the fixed-offset unpacks: a truncated file must
    # raise ValueError (the decode contract), not struct.error
    if len(buf) < 30:
        raise ValueError(f"BMP truncated ({len(buf)} < 30 header bytes)")
    header_size, width, height = struct.unpack("<Iii", buf[14:26])
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    bpp = struct.unpack("<H", buf[28:30])[0]
    return width, abs(height), bpp


def decode_y4m(buf: bytes) -> tuple[int, int, int, int, int]:
    """REAL Y4M decoder: parses the stream header tokens, walks FRAME
    markers validating 4:2:0 frame sizes, returns
    (width, height, n_frames, fps_num, fps_den). Raises on malformed input."""
    nl = buf.find(b"\n")
    if nl < 0 or not buf.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    width = height = fps_num = fps_den = None
    colorspace = "C420"
    for tok in buf[:nl].decode("ascii").split()[1:]:
        if tok[0] == "W":
            width = int(tok[1:])
        elif tok[0] == "H":
            height = int(tok[1:])
        elif tok[0] == "F":
            fps_num, fps_den = (int(x) for x in tok[1:].split(":"))
        elif tok[0] == "C":
            colorspace = tok
    if None in (width, height, fps_num, fps_den):
        raise ValueError("missing W/H/F header tokens")
    if not colorspace.startswith("C420"):
        raise ValueError(f"unsupported colorspace {colorspace}")
    frame_len = width * height * 3 // 2
    pos, n_frames = nl + 1, 0
    while pos < len(buf):
        fnl = buf.find(b"\n", pos)
        if buf[pos : pos + 5] != b"FRAME" or fnl < 0:
            raise ValueError(f"expected FRAME marker at byte {pos}")
        pos = fnl + 1 + frame_len
        if pos > len(buf):
            raise ValueError("truncated frame payload")
        n_frames += 1
    return width, height, n_frames, fps_num, fps_den


def decode_containers(containers: DataFrame) -> DataFrame:
    """mapInPandas decode stage over real container bytes."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dur, pix = [], []
            for mtype, payload in zip(pdf["media_type"], pdf["payload"]):
                if payload is None:  # NULL container → NULL decode metadata
                    dur.append(None)
                    pix.append(None)
                    continue
                buf = bytes(payload)
                if mtype == "audio":
                    channels, rate, n_samples = decode_wav(buf)
                    dur.append(n_samples * 1000 // rate)
                    pix.append(0)
                elif mtype == "image":
                    width, height, bpp = decode_bmp(buf)
                    if bpp != 24:
                        raise ValueError(f"unexpected bpp {bpp}")
                    dur.append(0)
                    pix.append(width * height)
                else:
                    width, height, n_frames, num, den = decode_y4m(buf)
                    dur.append(n_frames * 1000 * den // num)
                    pix.append(width * height * n_frames)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "duration_ms": dur,
                    "n_pixels": pix,
                }
            )

    return containers.mapInPandas(decode, DECODED_REAL_SCHEMA)


@query(
    "mm_decode_real",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                             ELSE 'video' END AS media_type,
             CAST(octet_length(encode(text)) AS BIGINT) AS n
      FROM documents
    )
    SELECT media_type,
           count(*) AS n_items,
           CAST(sum(CASE WHEN media_type = 'audio'
                 THEN (n // 2) * 1000 // (8000 + (doc_id % 8) * 1000)
                 WHEN media_type = 'video'
                 THEN (1 + n % 3) * 40
                 ELSE 0 END) AS BIGINT) AS total_duration_ms,
           CAST(sum(CASE WHEN media_type = 'image'
                 THEN (n % 64 + 1) * (n % 48 + 1)
                 WHEN media_type = 'video'
                 THEN (16 + n % 8 * 2) * (12 + n % 6 * 2) * (1 + n % 3)
                 ELSE 0 END) AS BIGINT) AS total_pixels
    FROM p GROUP BY media_type ORDER BY media_type
    """,
    survey_ref="X5b (real WAV/BMP/Y4M container decode, no codec libs needed)",
)
def mm_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Genuine decode pipeline across all three modalities: synthesize
    spec-valid WAV (audio), BMP (image), and Y4M (video) files → decode
    them by actually parsing the container structure (RIFF chunk walk /
    BITMAPINFOHEADER / YUV4MPEG2 header + FRAME walk) → aggregate
    durations and pixel counts.

    The oracle replays the synthesis geometry arithmetically (sample count
    from byte length, dimensions and frame counts from length mod), so a
    decoder bug — misread chunk size, wrong struct offset, stride error,
    frame-length drift — breaks the hash match. Unlike mm_decode_stats'
    declared stub, every byte of this path does what its name says;
    compressed formats (JPEG/MP3/H.264) would slot into the same two-stage
    shape given codec libraries."""
    media = media_table(spark, sf_dir)
    decoded = decode_containers(synthesize_containers(spread(media, spark)))
    return (
        decoded.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("duration_ms").alias("total_duration_ms"),
            F.sum("n_pixels").alias("total_pixels"),
        )
        .orderBy("media_type")
    )
