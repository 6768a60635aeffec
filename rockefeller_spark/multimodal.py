"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, partitioning,
Arrow-batched `mapInPandas` pipelines with bounded batch sizes. Codec work
goes through a TRY-IMPORT REGISTRY (``DECODERS``/``get_decoder``): PCM16
audio is always really decoded (raw int16 via numpy), PNG/JPEG decode via
PIL and H264 via the ffmpeg CLI when those are present in the deployment,
and any codec without a real decoder falls back to a clearly-marked
deterministic fake. Plan shapes, schemas, and batch handling are identical
in every mode, so installing a library changes zero engine code.

Scale notes (the part that matters at 100 TB):
- payloads never pass through Python row-at-a-time — Arrow moves them in
  columnar batches; `spark.sql.execution.arrow.maxRecordsPerBatch` bounds
  executor memory per batch;
- metadata predicates (kind/width/duration) are plain columns → pushed to
  the parquet scan, so a "videos longer than 60 s" filter never reads the
  blob column at all (parquet column projection);
- feature extraction emits fixed-width array<float> suitable for
  simsearch.py's ANN operators.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image | audio | video
    T.StructField("payload", T.BinaryType(), False),    # opaque encoded bytes
    T.StructField("width", T.IntegerType(), True),      # image/video
    T.StructField("height", T.IntegerType(), True),
    T.StructField("sample_rate", T.IntegerType(), True),  # audio
    T.StructField("duration_ms", T.IntegerType(), True),  # audio/video
    T.StructField("codec", T.StringType(), False),
])

FEATURE_DIM = 32

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.IntegerType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), False),
])

THUMB_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("thumb", T.BinaryType(), False),
    T.StructField("thumb_w", T.IntegerType(), False),
    T.StructField("thumb_h", T.IntegerType(), False),
])

FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("frame", T.BinaryType(), False),
])


def gen_media(spark: SparkSession, n: int = 1000, seed: int = 42,
              num_partitions: int | None = None) -> DataFrame:
    """Deterministic synthetic media table: every field is a pure function
    of (media_id, seed) via md5-derived hashes — portable, so the SQL
    oracle regenerates the identical table from ``range(n)`` (no parquet
    fixture needed) and any scale regenerates identically (mirrors
    gen.py's philosophy; no RNG state)."""
    ids = spark.range(0, n, numPartitions=num_partitions)

    def h(k: int):
        # 60-bit positive hash of "id:seed:k" — same formula the DuckDB
        # oracle uses ( ('0x'||substr(md5(...),1,15))::BIGINT )
        return F.conv(F.substring(F.md5(F.concat_ws(
            ":", F.col("id").cast("string"), F.lit(str(seed)), F.lit(str(k)))),
            1, 15), 16, 10).cast("long")

    kind = (F.when(h(0) % 3 == 0, "image")
            .when(h(0) % 3 == 1, "audio")
            .otherwise("video"))
    # payload: repeat md5(id) to a deterministic pseudo-encoded blob of
    # exactly size_kb*1024 bytes (hex chars are 1 byte each in utf-8)
    size_kb = h(1) % 8 + 1
    payload = F.to_binary(
        F.substring(F.repeat(F.md5(F.col("id").cast("string")), 64 * 8),
                    F.lit(1), (size_kb * 1024).cast("int")), F.lit("utf-8"))
    is_visual = kind.isin("image", "video")
    return ids.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.when(is_visual, (h(2) % 8 * 160 + 320).cast("int")).alias("width"),
        F.when(is_visual, (h(3) % 8 * 90 + 240).cast("int")).alias("height"),
        F.when(kind == "audio", F.lit(16000).cast("int")).alias("sample_rate"),
        F.when(kind != "image", (h(4) % 120_000 + 500).cast("int")).alias("duration_ms"),
        F.when(kind == "image", F.lit("png"))
         .when(kind == "audio", F.lit("pcm16")).otherwise(F.lit("h264")).alias("codec"),
    )


# ------------------------------------------------------------ codec registry

def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in 'decode': a keyed digest stream in place of
    pixel/sample data. Used whenever no real decoder is registered or
    importable for a codec — the Arrow plumbing, schemas, batch shapes,
    and plans are identical either way."""
    d = hashlib.sha256(payload[:4096]).digest()
    return np.frombuffer((d * ((FEATURE_DIM * 4) // len(d) + 1))[:FEATURE_DIM * 4],
                         dtype=np.uint32).astype(np.float64)


def _decode_pcm16(payload: bytes) -> np.ndarray:
    """REAL audio decode — PCM16 is raw little-endian int16 samples, so
    numpy (always present) decodes it natively, no external library."""
    n = len(payload) - (len(payload) % 2)
    return np.frombuffer(payload[:n], dtype="<i2").astype(np.float64)


def _decode_pil(payload: bytes) -> np.ndarray:
    """REAL image decode via PIL (only registered when importable):
    grayscale pixel stream."""
    import io
    from PIL import Image
    with Image.open(io.BytesIO(payload)) as im:
        return np.asarray(im.convert("L"), dtype=np.float64).ravel()


def _try_import_pil() -> bool:
    try:
        import PIL.Image  # noqa: F401
        return True
    except Exception:
        return False


def _have_ffmpeg() -> bool:
    import shutil
    return shutil.which("ffmpeg") is not None


def _decode_ffmpeg(payload: bytes) -> np.ndarray:
    """REAL video decode via the ffmpeg CLI (only registered when the
    binary exists): first frame as grayscale bytes."""
    import subprocess
    out = subprocess.run(
        ["ffmpeg", "-loglevel", "error", "-i", "pipe:0", "-frames:v", "1",
         "-f", "rawvideo", "-pix_fmt", "gray", "pipe:1"],
        input=payload, capture_output=True, check=True).stdout
    return np.frombuffer(out, dtype=np.uint8).astype(np.float64)


HAVE_PIL = _try_import_pil()
HAVE_FFMPEG = _have_ffmpeg()

# codec → decoder, resolved ONCE at import by availability. pcm16 is always
# real (numpy); png/jpeg go real when PIL imports; h264 when ffmpeg exists;
# everything else (and every absent library) falls back to _fake_decode.
# register_decoder() lets a deployment plug its own codecs in.
DECODERS: dict[str, Any] = {"pcm16": _decode_pcm16}
if HAVE_PIL:
    DECODERS["png"] = _decode_pil
    DECODERS["jpeg"] = _decode_pil
if HAVE_FFMPEG:
    DECODERS["h264"] = _decode_ffmpeg


def register_decoder(codec: str, fn) -> None:
    DECODERS[codec] = fn


def get_decoder(codec: str):
    """The decoder for ``codec``: real when registered/importable,
    ``_fake_decode`` otherwise — callers never branch."""
    return DECODERS.get(codec, _fake_decode)


def extract_features(media: DataFrame, batch_rows: int = 256,
                     real_codecs: bool = False) -> DataFrame:
    """Binary → fixed-width float feature vector via Arrow-batched
    mapInPandas. The iterator contract keeps peak memory at one batch of
    payloads per task regardless of partition size.

    ``real_codecs=False`` (default) uses the deterministic stand-in for
    every row — the oracle-reproducible mode (synthetic fixtures carry
    keystream payloads, not real encodings). ``real_codecs=True``
    dispatches per row through the codec registry (``get_decoder``), so
    rows whose codec has a real importable decoder are REALLY decoded;
    the plan, schema, and batch shapes are identical in both modes."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start:start + batch_rows]
                if real_codecs:
                    decoded = [get_decoder(c)(p)
                               for c, p in zip(chunk["codec"],
                                               chunk["payload"])]
                else:
                    decoded = [_fake_decode(p) for p in chunk["payload"]]
                feats = [(_fold_feature(d) % 1000.0 / 1000.0).astype(np.float32)
                         for d in decoded]
                yield pd.DataFrame({
                    "media_id": chunk["media_id"].values,
                    "kind": chunk["kind"].values,
                    "n_bytes": chunk["payload"].map(len).astype("int32").values,
                    "feature": [f.tolist() for f in feats],
                })
    return media.mapInPandas(run, FEATURES_SCHEMA)


def _fold_feature(decoded: np.ndarray) -> np.ndarray:
    """Fold an arbitrary-length decoded stream into FEATURE_DIM floats
    (truncate-or-cycle + segment sums) — same output length regardless of
    which decoder produced the stream."""
    if len(decoded) == 0:
        return np.zeros(FEATURE_DIM)
    if len(decoded) == FEATURE_DIM:
        return decoded
    if len(decoded) < FEATURE_DIM:
        reps = -(-FEATURE_DIM // len(decoded))
        return np.tile(decoded, reps)[:FEATURE_DIM]
    cut = len(decoded) - (len(decoded) % FEATURE_DIM)
    return decoded[:cut].reshape(FEATURE_DIM, -1).sum(axis=1)


def resize_images(media: DataFrame, max_side: int = 64) -> DataFrame:
    """Thumbnail pipeline: filter is metadata-only (pushed to the scan;
    the blob column is read only for surviving rows), then a batched stub
    resize (truncate-the-stream stand-in for real resampling)."""
    imgs = media.filter(F.col("kind") == "image")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            scale = np.minimum(1.0, max_side / np.maximum(
                pdf["width"].values, pdf["height"].values))
            tw = np.maximum(1, (pdf["width"].values * scale)).astype("int32")
            th = np.maximum(1, (pdf["height"].values * scale)).astype("int32")
            nbytes = (tw.astype("int64") * th).clip(1, 1 << 16)
            yield pd.DataFrame({
                "media_id": pdf["media_id"].values,
                "thumb": [bytes(p[:n]) for p, n in zip(pdf["payload"], nbytes)],
                "thumb_w": tw, "thumb_h": th,
            })
    return imgs.mapInPandas(run, THUMB_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 10_000) -> DataFrame:
    """Video frame sampling: duration metadata decides frame count
    (JVM-side), the stub 'frame' is a deterministic slice per index."""
    vids = media.filter(F.col("kind") == "video")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame": []}
            for mid, payload, dur in zip(pdf["media_id"], pdf["payload"],
                                         pdf["duration_ms"]):
                n_frames = max(1, int(dur) // every_ms)
                step = max(1, len(payload) // n_frames)
                for i in range(n_frames):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame"].append(bytes(payload[i * step:i * step + 64]))
            yield pd.DataFrame(rows)
    return vids.mapInPandas(run, FRAME_SCHEMA)


def media_summary(media: DataFrame) -> DataFrame:
    """Metadata-only rollup — never touches the payload column (verify
    with .explain: ReadSchema excludes `payload`)."""
    return (media.groupBy("kind", "codec")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.avg("duration_ms"), 6).alias("avg_duration_ms"),
                 F.max("width").alias("max_width")))
