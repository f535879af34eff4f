"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with a typed metadata
struct. The Spark-side plumbing — schema, partition-friendly batch
processing via mapInPandas (Arrow batches, never per-row Python), UDF
signatures — is real and tested; the actual codec work (image decode,
resampling, frame extraction) is stubbed because codec libraries
(PIL/torchaudio/av) are not in this container: gated behind import-try
with a documented NotImplementedError fallback.

At 100 TB: payload bytes live in parquet binary columns (or object-store
pointers); mapInPandas streams Arrow batches through the Python worker
with spark.sql.execution.arrow.maxRecordsPerBatch bounding memory, and
the output schema is declared so Catalyst plans downstream ops normally.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

META_OUT_SCHEMA = "doc_id long, n_bytes long, content_hash string"


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic fake media payload: the UTF-8 bytes of the text in a
    ``binary`` column plus a typed metadata struct — the exact shape a
    real image/audio table would have."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def extract_payload_meta(df: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column: size and
    content hash per payload. This is the real mapInPandas path a decoder
    would use — batch in, batch out, no row-at-a-time serde."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "content_hash": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(batches, META_OUT_SCHEMA)


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def decode_images(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Decode image payloads to (width, height, mode) via an Arrow-batched
    pandas pass. STUB in this container: PIL is unavailable, so invoking
    the returned plan raises NotImplementedError from the executor; the
    plumbing (schema, batch signature) is the real implementation shape.
    """
    out_schema = "doc_id long, width int, height int, mode string"

    if _pil_available():
        import io

        from PIL import Image

        def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                decoded = [Image.open(io.BytesIO(bytes(b))) for b in pdf[payload_col]]
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "width": [im.width for im in decoded],
                        "height": [im.height for im in decoded],
                        "mode": [im.mode for im in decoded],
                    }
                )

    else:

        def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            raise NotImplementedError(
                "image decode requires PIL, which is not installed in this "
                "container; the mapInPandas plumbing is the supported path"
            )
            yield  # pragma: no cover

    return df.select("doc_id", payload_col).mapInPandas(batches, out_schema)


def sample_frame_offsets(
    df: DataFrame,
    *,
    duration_col: str = "duration_ms",
    n_frames: int = 4,
) -> DataFrame:
    """Deterministic frame-sampling plan for video payloads: evenly spaced
    sample timestamps from the metadata duration — pure column math (the
    decode of those frames is the stubbed step, not the planning)."""
    idx = F.sequence(F.lit(0), F.lit(n_frames - 1))
    return df.withColumn(
        "frame_offsets_ms",
        F.transform(idx, lambda i: (F.col(duration_col) * i / n_frames).cast("long")),
    )
