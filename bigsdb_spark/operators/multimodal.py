"""Multimodal columns: opaque binary payloads + typed metadata
(training-data pipeline family; beyond-reference extension).

Images/audio/video are ``binary`` columns with a mime string. The
decode / feature-extract step runs as an Arrow-batched ``mapInPandas``
over partitions — the Spark-side plumbing (schema, batch shape, UDF
signature, partitioning) is real and tested; the actual codec call is a
deterministic stub because the image/audio libraries are not in this
container (clearly marked below — swap ``_decode_stub`` for PIL/ffmpeg
in a real deployment).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def binary_metadata(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Cheap JVM-side metadata over the opaque payload (no decode):
    byte length + content hash — enough for exact media dedup."""
    return df.select(
        F.col(id_col),
        F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
        F.md5(F.col(payload_col)).alias("content_md5"),
    )


_FEATURE_DIM = 8

_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _decode_stub(payload: bytes) -> tuple[int, int, list[float]]:
    """STUB decode: deterministic fake 'image decode + embed'.

    A real deployment replaces this with PIL/torchvision/ffmpeg; the
    signature (bytes in, dims + feature vector out) is the contract the
    Spark plumbing is built against. Features are quantized to 4dp so
    the fake is engine-independently reproducible (the float32 round
    trip preserves 4dp exactly for values in [0, 1]) — which lets the
    driver gate check this path against a DuckDB sha256-based oracle
    instead of a rows-only count.
    """
    digest = hashlib.sha256(payload).digest()
    width = 1 + digest[0]
    height = 1 + digest[1]
    feats = [round(b / 255.0, 4) for b in digest[:_FEATURE_DIM]]
    return width, height, feats


def _decode_pil(payload: bytes) -> tuple[int, int, list[float]]:
    """Real decode path (same contract as ``_decode_stub``): PIL image
    open + an 8-dim deterministic feature (mean brightness over a 2x4
    grid of the grayscale image, 4dp). Only reachable when PIL is
    importable — feature-detected by ``pick_decoder``."""
    import io

    import numpy as np
    from PIL import Image

    img = Image.open(io.BytesIO(payload))
    img.load()
    width, height = img.size
    arr = np.asarray(img.convert("L"), dtype=np.float64) / 255.0
    gh, gw = 2, 4
    feats = []
    for i in range(gh):
        for j in range(gw):
            cell = arr[
                i * arr.shape[0] // gh : (i + 1) * arr.shape[0] // gh,
                j * arr.shape[1] // gw : (j + 1) * arr.shape[1] // gw,
            ]
            feats.append(round(float(cell.mean()) if cell.size else 0.0, 4))
    return width, height, feats


def pick_decoder(codec: str = "stub"):
    """Decoder dispatch: ``stub`` (default — the deterministic,
    oracle-checkable fake), ``pil`` (require the real codec; raises
    when PIL is absent), ``auto`` (real codec when importable, stub
    otherwise). The returned callable is serialized into the Spark
    task, so the import check runs where the decision is made — pass
    ``auto`` only when the driver and executors share an environment
    (true for this project's deployment model)."""
    if codec == "stub":
        return _decode_stub
    try:
        import PIL.Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    if codec == "pil":
        if not have_pil:
            raise ImportError("codec='pil' requested but PIL is not installed")
        return _decode_pil
    if codec == "auto":
        return _decode_pil if have_pil else _decode_stub
    raise ValueError(f"unknown codec: {codec}")


def extract_features(
    df: DataFrame, id_col: str, payload_col: str, codec: str = "stub"
) -> DataFrame:
    """Arrow-batched decode/feature-extract over partitions.

    mapInPandas keeps the per-batch Python overhead amortized (one
    Arrow RecordBatch per ~10k rows) — this is the sanctioned pattern
    for any per-payload Python work at 100 TB scale. ``codec`` picks
    the decoder via ``pick_decoder``; the default stays the
    deterministic stub so the driver-gate oracle path is unchanged.
    """
    decode = pick_decoder(codec)

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                width, height, feats = decode(data)
                rows.append((doc_id, len(data), width, height, feats))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_bytes", "width", "height", "features"]
            )

    return df.select(id_col, payload_col).mapInPandas(_batches, _FEATURES_SCHEMA)


_FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("t_frac", FloatType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def sample_frames(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    n_frames: int = 4,
    codec: str = "stub",
) -> DataFrame:
    """Video frame sampling plumbing: one row per evenly spaced frame
    (UDTF-shaped fan-out, ``t_frac`` = position in [0,1)), features
    per frame via the dispatched decoder.

    STUB FRAMING: the container has no video codec, so a "frame" is a
    deterministic byte slice of the payload at the sampled offset (the
    slice boundaries are exactly the frame timestamps a real ffmpeg
    seek would use) — swap the slicer for ffmpeg frame extraction in a
    real deployment; the Spark-side shape (Arrow batches, explode
    cardinality, schema, per-frame decode) is the production shape.
    """
    if n_frames < 1:
        raise ValueError(f"n_frames must be >= 1, got {n_frames}")
    decode = pick_decoder(codec)

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                # proportional bounds (round(i*len/n)) so the slices
                # tile the WHOLE payload — a fixed integer span drops
                # the tail whenever len % n_frames != 0 and skews the
                # reported t_frac off the true slice position
                bounds = [
                    round(i * len(data) / n_frames) for i in range(n_frames + 1)
                ]
                for i in range(n_frames):
                    chunk = data[bounds[i] : bounds[i + 1]] or b"\x00"
                    width, height, feats = decode(chunk)
                    rows.append(
                        (doc_id, i, i / n_frames, width, height, feats)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "t_frac", "width", "height", "features",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(_batches, _FRAMES_SCHEMA)


def _resize_stub(payload: bytes, width: int, height: int) -> list[float]:
    """CLEARLY-MARKED STUB resize: deterministic features keyed on
    (payload, target dims) — a real deployment swaps in PIL's
    Image.resize + feature extractor with the same signature.  Reuses
    the decode stub so dimensionality and 4dp quantization stay in one
    place."""
    _, _, feats = _decode_stub(payload + f":{width}x{height}".encode())
    return feats


def resize_images(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    width: int,
    height: int,
) -> DataFrame:
    """Batch image-resize plumbing: every payload mapped to the target
    (width, height) with post-resize features — Arrow-batched like
    extract_features; the codec step is the deterministic stub above.
    """

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                feats = _resize_stub(bytes(payload), width, height)
                rows.append((doc_id, width, height, feats))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "features"]
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("features", ArrayType(FloatType())),
        ]
    )
    return df.select(id_col, payload_col).mapInPandas(_batches, schema)
