"""Multimodal column operators: opaque binary media + typed metadata.

Beyond-reference surface (SURVEY.md §7 step 7). Images/audio/video
are carried as opaque ``binary`` columns with a typed metadata
struct; decode / feature-extract / frame-sample run as Arrow-batched
``mapInPandas`` stages — the Spark-side plumbing (schema, batch
shape, partitioning) is real and oracle-tested, while the actual
codec call is stubbed (image/audio libraries are not in this
container) behind :func:`decode_image_real`.

Fixture media is generated deterministically from the ``documents``
table: ``media = unhex(md5(text))`` — a 16-byte "image" both engines
can derive, so the pandas-side byte arithmetic hash-matches a pure
SQL oracle (the oracle recomputes each byte from the md5 hex
string). All cross-engine float hazards are avoided by integer
arithmetic (floor division) in the derived features.

Scale design: ``mapInPandas`` keeps the operator partition-parallel
with Arrow transfer (no per-row Python); decode output schemas are
declared up front so Catalyst can prune columns through the stage.
A real deployment reads media from object storage as
``binaryFile`` sources partitioned by content hash — same plan
shape, bigger blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Deterministic fake-media geometry (bytes of unhex(md5(text))).
MEDIA_BYTES = 16
FRAME_STRIDE = 4

FEATURE_SCHEMA = (
    "doc_id long, byte_len long, header_hex string, "
    "checksum long, mean_milli long"
)
FRAME_SCHEMA = "doc_id long, frame_idx long, frame_val long"


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Attach a deterministic binary media column + typed metadata
    struct to each document (the multimodal table layout: blob +
    metadata travel together, decode is lazy/downstream)."""
    h = "md5(text)"
    return docs.select(
        "doc_id",
        F.expr(f"unhex({h})").alias("media"),
        F.struct(
            F.expr(
                f"CAST(conv(substring({h},1,4),16,10) % 640 + 1 AS INT)"
            ).alias("width"),
            F.expr(
                f"CAST(conv(substring({h},5,4),16,10) % 480 + 1 AS INT)"
            ).alias("height"),
            F.lit("fake/rgb8").alias("format"),
        ).alias("meta"),
    )


def extract_features(media_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary media.

    Each pandas batch computes byte-level features (length, header
    bytes, checksum, integer mean intensity). Integer-only math so
    the DuckDB oracle reproduces values exactly from the md5 hex."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            media = pdf["media"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": media.map(len),
                    "header_hex": media.map(lambda b: bytes(b[:4]).hex()),
                    "checksum": media.map(lambda b: sum(b)),
                    # floor division: portable, no float rounding
                    "mean_milli": media.map(
                        lambda b: (sum(b) * 1000) // (len(b) * 255)
                    ),
                }
            )

    return media_df.select("doc_id", "media").mapInPandas(
        batches, schema=FEATURE_SCHEMA
    )


def sample_frames(media_df: DataFrame, stride: int = FRAME_STRIDE) -> DataFrame:
    """Frame sampling for "video" media: emit every ``stride``-th
    byte as a frame row — a row-exploding mapInPandas stage (the
    decode-then-flatten shape a real video pipeline uses)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [
                (int(doc_id), idx, int(b[idx]))
                for doc_id, b in zip(pdf["doc_id"], pdf["media"])
                for idx in range(0, len(b), stride)
            ]
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_val"]
            )

    return media_df.select("doc_id", "media").mapInPandas(
        batches, schema=FRAME_SCHEMA
    )


AUDIO_CHUNK = 4
CHUNK_SCHEMA = "doc_id long, chunk_idx long, n_samples long, energy long"


def chunk_audio(media_df: DataFrame, chunk: int = AUDIO_CHUNK) -> DataFrame:
    """Fixed-window "audio" segmentation: split the sample stream
    into ``chunk``-sample windows and compute per-window integer
    energy (sum of squares) — the windowed-segmentation primitive
    behind VAD/feature pipelines, as a row-exploding Arrow-batched
    mapInPandas stage. Integer-only math so the SQL oracle
    reproduces every value from the md5 hex. At scale the chunker
    runs per partition over object-store blobs — no shuffle until
    the (much smaller) feature rows aggregate."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf["media"]):
                bb = bytes(b)
                for ci in range(0, len(bb), chunk):
                    seg = bb[ci:ci + chunk]
                    rows.append(
                        (
                            int(doc_id),
                            ci // chunk,
                            len(seg),
                            sum(x * x for x in seg),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "chunk_idx", "n_samples", "energy"]
            )

    return media_df.select("doc_id", "media").mapInPandas(
        batches, schema=CHUNK_SCHEMA
    )


def decode_image_real(media_df: DataFrame) -> DataFrame:
    """REAL image decode — STUB. The container ships no image codecs
    (no PIL/opencv); on a real cluster install pillow on executors
    and replace the body of ``batches`` with ``Image.open(BytesIO(b))``.
    The mapInPandas signature/schema contract is identical to
    :func:`extract_features`."""
    try:
        import PIL  # noqa: F401
    except ImportError as exc:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "image decode requires pillow on executors; the Spark "
            "plumbing (schema, Arrow batching, partitioning) is "
            "exercised via extract_features/sample_frames instead"
        ) from exc
    raise NotImplementedError("real decode path not wired in this container")
