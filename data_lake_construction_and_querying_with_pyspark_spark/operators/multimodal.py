"""Multimodal column handling (SURVEY.md §7 Phase 3c).

Images / audio / video live in the lake as opaque ``binary`` columns
with a typed metadata struct alongside (path, length, modality,
declared dims). The Spark-side plumbing — binaryFile ingest, schema,
Arrow-batched ``mapInPandas`` decode/feature/frame-sample operators,
partitioning by modality — is real and tested; the *codec* step is
stubbed: the container ships no image/audio libraries, so decoding
dispatches to Pillow/soundfile when importable and otherwise to a
clearly-marked deterministic fake (or raises NotImplementedError in
``strict`` mode).

Everything crossing the Python boundary goes through ``mapInPandas``
(Arrow batches, vectorized) — never a row-at-a-time UDF. At 100 TB the
binary payloads dominate I/O: keep them in their own column family
(parquet writes binary columns as-is), partition by modality/date, and
push metadata-only predicates so Catalyst prunes the binary column out
of scans that don't decode.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MODALITIES = ("image", "audio", "video", "unknown")

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_path", T.StringType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ]
)

_EXT_TO_MODALITY = {
    "jpg": "image", "jpeg": "image", "png": "image", "gif": "image", "bmp": "image",
    "wav": "audio", "mp3": "audio", "flac": "audio", "ogg": "audio",
    "mp4": "video", "avi": "video", "mkv": "video", "webm": "video",
}


def assets_from_binary_files(binary_df: DataFrame) -> DataFrame:
    """Normalize a ``spark.read.format('binaryFile')`` frame into the
    engine's asset schema: path, inferred modality, size, raw bytes."""
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    modality = ext
    mapping = F.create_map(*[F.lit(x) for kv in _EXT_TO_MODALITY.items() for x in kv])
    return binary_df.select(
        F.col("path").alias("asset_path"),
        F.coalesce(mapping[modality], F.lit("unknown")).alias("modality"),
        F.col("length").alias("n_bytes"),
        F.col("content"),
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_path", T.StringType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("decoder", T.StringType()),
    ]
)

_FEATURE_DIM = 16


def _fake_decode(content: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for a real codec: dims and features are
    derived from a sha256 of the bytes. STUB — replace with
    Pillow/torchvision in a full deployment."""
    digest = hashlib.sha256(content).digest()
    width = 16 + digest[0] % 240
    height = 16 + digest[1] % 240
    feature = [b / 255.0 for b in digest[:_FEATURE_DIM]]
    return width, height, feature


def _real_image_decode(content: bytes):
    """Pillow decode — only reachable when PIL is installed."""
    import io

    from PIL import Image  # noqa: F401

    img = Image.open(io.BytesIO(content))
    width, height = img.size
    # Tiny grayscale thumbnail as the feature vector.
    thumb = img.convert("L").resize((4, 4))
    feature = [p / 255.0 for p in thumb.getdata()]
    return width, height, feature


def extract_features(assets: DataFrame, strict: bool = False) -> DataFrame:
    """Decode + featurize binary assets via Arrow-batched mapInPandas.

    ``strict=True`` raises NotImplementedError when no real codec is
    importable instead of falling back to the deterministic fake.
    """

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        try:
            import PIL  # noqa: F401

            decode, decoder_name = _real_image_decode, "pillow"
        except ImportError:
            if strict:
                raise NotImplementedError(
                    "no image codec available in this environment; "
                    "install Pillow or run with strict=False for the "
                    "deterministic stub decoder"
                )
            decode, decoder_name = None, "stub-sha256"

        for pdf in batches:
            rows = []
            for path, modality, n_bytes, content in zip(
                pdf["asset_path"], pdf["modality"], pdf["n_bytes"], pdf["content"]
            ):
                content = bytes(content) if content is not None else b""
                sha = hashlib.sha256(content).hexdigest()
                if decode is not None:
                    try:
                        w, h, feat = decode(content)
                    except Exception:
                        w, h, feat = _fake_decode(content)
                else:
                    w, h, feat = _fake_decode(content)
                rows.append((path, modality, int(n_bytes), sha, w, h, feat, decoder_name))
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_path", "modality", "n_bytes", "content_sha",
                    "width", "height", "feature", "decoder",
                ],
            )

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_path", T.StringType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def sample_frames(assets: DataFrame, frame_size: int = 4096, stride: int = 4) -> DataFrame:
    """Frame-sampling plumbing for video-like assets: every ``stride``-th
    ``frame_size`` chunk of the payload becomes a row. With a real
    container parser the chunking would follow keyframe offsets; the
    batch shape, schema, and explode mechanics are what this pins."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["asset_path"], pdf["content"]):
                content = bytes(content) if content is not None else b""
                n_frames = max(1, (len(content) + frame_size - 1) // frame_size)
                for i in range(0, n_frames, stride):
                    rows.append((path, i, content[i * frame_size : (i + 1) * frame_size]))
            yield pd.DataFrame(rows, columns=["asset_path", "frame_index", "frame_bytes"])

    return assets.filter(F.col("modality") == "video").mapInPandas(run, schema=FRAME_SCHEMA)
