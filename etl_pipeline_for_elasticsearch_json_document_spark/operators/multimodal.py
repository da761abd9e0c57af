"""Multimodal column operators: image/audio/video as opaque ``binary``
columns with typed metadata structs.

REAL image decode runs JVM-side with zero Python installs:
:func:`read_images` / :func:`decode_image_files` use Spark's built-in
``image`` file source (ImageIO-backed), which decodes PNG/JPEG into
``struct<origin, height, width, nChannels, mode, data>`` inside the scan
— no UDF, no Arrow hop, whole-stage-codegen downstream. That is the
production path for image corpora laid out as files (the usual 100 TB
shape: a manifest + image files on object storage).

For payloads embedded as a ``binary`` column there is ALSO a real
no-install route: :func:`decode_embedded_images` stages the bytes to
files (executor-side, map-only) and reads them back through the same JVM
``image`` source — parity with :func:`decode_image_files` pinned in
tests on stdlib-crafted PNGs. The ``mapInPandas`` plumbing remains for
codec libraries: ``decode_images`` uses a clearly-marked deterministic
fake (keeps oracles exact), ``decode_images_real`` delegates to PIL when
installed and raises ``NotImplementedError`` at the exact plug-in point
otherwise (fallback-only now that the staging route exists).

At 100 TB: binary payloads ride in parquet alongside metadata; decode is
map-only (no shuffle), so throughput scales linearly with executors, and
Arrow batching keeps the Python boundary amortized (~10-100× over
row-at-a-time UDFs).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DECODE_SCHEMA = "doc_id long, width int, height int, n_pixels long"


def read_images(spark: SparkSession, path: str, drop_invalid: bool = True) -> DataFrame:
    """REAL image decode via Spark's built-in JVM ``image`` source
    (ImageIO): one row per file with ``image struct<origin, height, width,
    nChannels, mode, data>``. Decoding happens inside the scan on
    executors — distributed, no Python boundary, no extra installs.
    ``drop_invalid`` skips unparseable files instead of failing the scan
    (the right default for a crawled corpus)."""
    reader = spark.read.format("image")
    if drop_invalid:
        reader = reader.option("dropInvalid", "true")
    return reader.load(path)


def decode_image_files(spark: SparkSession, path: str, drop_invalid: bool = True) -> DataFrame:
    """Typed feature projection over :func:`read_images` — the real-codec
    twin of :func:`decode_images`'s output shape, keyed by file origin:
    (origin, width, height, n_channels, mode, n_pixels)."""
    return read_images(spark, path, drop_invalid).select(
        F.col("image.origin").alias("origin"),
        F.col("image.width").alias("width"),
        F.col("image.height").alias("height"),
        F.col("image.nChannels").alias("n_channels"),
        F.col("image.mode").alias("mode"),
        (F.col("image.width").cast("long") * F.col("image.height")).alias("n_pixels"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """DETERMINISTIC FAKE decode: derives a plausible (width, height) from
    the payload bytes. Stands in for an image decoder; keeps tests and
    oracles exact."""
    width = 16 + len(payload) % 64
    height = 16 + (payload[0] if payload else 0) % 64
    return width, height


def decode_images(df: DataFrame, payload_col: str, id_col: str = "doc_id") -> DataFrame:
    """Binary payload → (width, height, n_pixels) feature columns via
    Arrow-batched mapInPandas. Swap ``_fake_decode`` for a real codec."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf[payload_col].map(_fake_decode)
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": [w for w, _ in dims],
                    "height": [h for _, h in dims],
                }
            )
            out["n_pixels"] = out["width"].astype("int64") * out["height"].astype("int64")
            yield out

    return df.mapInPandas(decode, schema=DECODE_SCHEMA)


def real_codec_available() -> bool:
    """True when a real image codec (PIL) is importable in this process."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _real_decode(payload: bytes) -> tuple[int, int]:
    """Decode ``payload`` with PIL and return (width, height).

    Raises :class:`NotImplementedError` when no codec library is present —
    the exact plug-in point for PIL/libvips/ffmpeg. Module-level (not a
    closure) so tests can assert the stub behavior WITHOUT running a Spark
    action (a raising mapInPandas poisons the reused Python worker for the
    next test)."""
    try:
        import io

        import PIL.Image
    except ImportError as e:
        raise NotImplementedError(
            "image codec not available in this environment; "
            "install PIL/pyvips and decode the payload here"
        ) from e
    with PIL.Image.open(io.BytesIO(payload)) as im:
        return im.width, im.height


def decode_images_real(df: DataFrame, payload_col: str, id_col: str = "doc_id") -> DataFrame:
    """Real-decoder variant of :func:`decode_images`: identical plumbing
    (schema, Arrow batching, map-only partitioning), with the codec step
    delegated to :func:`_real_decode` (PIL when installed, else a clear
    NotImplementedError)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf[payload_col].map(lambda p: _real_decode(bytes(p)))
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": [w for w, _ in dims],
                    "height": [h for _, h in dims],
                }
            )
            out["n_pixels"] = out["width"].astype("int64") * out["height"].astype("int64")
            yield out

    return df.mapInPandas(decode, schema=DECODE_SCHEMA)


def decode_embedded_images(
    df: DataFrame,
    payload_col: str,
    id_col: str = "doc_id",
    stage_dir: str | None = None,
) -> DataFrame:
    """REAL decode for payloads already embedded in a ``binary`` column,
    with NO Python codec: stage each payload to a file (executor-side,
    map-only — ids become filenames), then decode the staged directory
    through the same JVM ``image`` source as :func:`decode_image_files`.
    Output matches :func:`decode_images_real`: (doc_id, width, height,
    n_pixels); undecodable payloads are dropped inside the scan
    (``dropInvalid`` — crawled-corpus default).

    ``stage_dir`` must be visible to both writers and the subsequent scan
    — on a real cluster that means shared storage (HDFS/NFS/object-store
    mount); on local mode any temp dir works. The staging write is one
    extra sequential read+write of the payload bytes — the price of
    keeping the decoder JVM-side with zero installs; when PIL/libvips IS
    available, :func:`decode_images_real` skips the round trip.
    """
    import os
    import tempfile

    spark = df.sparkSession
    stage_dir = stage_dir or tempfile.mkdtemp(prefix="etl_pipeline_img_stage_")

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        os.makedirs(stage_dir, exist_ok=True)
        n = 0
        for pdf in batches:
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                with open(os.path.join(stage_dir, f"{int(doc_id)}.img"), "wb") as f:
                    f.write(bytes(payload))
            n += len(pdf)
        yield pd.DataFrame({"staged": [n]})

    # materialize the staging pass (map-only; count forces every partition)
    df.select(id_col, payload_col).mapInPandas(stage, "staged long").count()

    return decode_image_files(spark, stage_dir, drop_invalid=True).select(
        F.regexp_extract(F.col("origin"), r"(\d+)\.img$", 1).cast("long").alias("doc_id"),
        "width",
        "height",
        "n_pixels",
    )


def audio_chunk_plan(
    df: DataFrame,
    n_samples_col: str,
    window: int = 16000,
    hop: int = 8000,
) -> DataFrame:
    """Overlapping audio chunking plan: one row per (window, hop) chunk of a
    track — the fan-out a feature extractor (fbank/wav2vec) consumes.

    ``n_samples_col`` is the per-row sample count from container metadata
    (decode stays stubbed, the plan shape is real). Pure ``sequence`` +
    ``explode`` — map-only, no shuffle; tracks shorter than one window yield
    no chunks. Guarded ``when`` because Spark's ``sequence`` counts DOWN
    when start > stop — an unguarded short track would emit phantom chunks.
    Columns: input cols + chunk_start, chunk_end (sample offsets).
    """
    from pyspark.sql import functions as F

    n = F.col(n_samples_col)
    starts = F.when(
        n >= window, F.sequence(F.lit(0), n - window, F.lit(hop))
    ).otherwise(F.array().cast("array<long>"))
    return df.withColumn("chunk_start", F.explode(starts)).withColumn(
        "chunk_end", F.col("chunk_start") + window
    )


def frame_sample_plan(df: DataFrame, payload_col: str, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan* shape: one row per sampled frame index.

    Emits (id, frame_idx) pairs from fake metadata — demonstrates the
    explode-style fan-out a real frame sampler produces, still map-only.
    """
    from pyspark.sql import functions as F

    n_frames = (F.length(F.col(payload_col)) % 300 + 1).alias("n_frames")
    return (
        df.withColumn("n_frames", n_frames)
        .withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))),
        )
        .drop("n_frames")
    )
