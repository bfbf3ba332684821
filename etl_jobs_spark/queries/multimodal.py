"""Multimodal query declarations (SURVEY.md §7 step 7).

The Spark side does real binary-column work (unhex → bytes →
Arrow-batched mapInPandas); the oracle recomputes every byte from
the md5 hex string with integer-only SQL, so the two engines must
agree bit-for-bit.
"""

from __future__ import annotations

from etl_jobs_spark.operators import multimodal as MM
from etl_jobs_spark.registry import register
from etl_jobs_spark.sources.readers import read_table


def _byte(j: int) -> str:
    """j-th byte of unhex(md5(text)) recovered from the hex string."""
    return f"('0x' || substr(md5(text), {2 * j + 1}, 2))::BIGINT"


_CHECKSUM = "(" + " + ".join(_byte(j) for j in range(MM.MEDIA_BYTES)) + ")"


@register(
    "multimodal_decode_features",
    oracle=f"""
    SELECT doc_id,
           CAST({MM.MEDIA_BYTES} AS BIGINT)       AS byte_len,
           substr(md5(text), 1, 8)                AS header_hex,
           CAST({_CHECKSUM} AS BIGINT)            AS checksum,
           CAST(({_CHECKSUM} * 1000) // ({MM.MEDIA_BYTES} * 255) AS BIGINT)
                                                  AS mean_milli
    FROM documents
    """,
)
def multimodal_decode_features(spark, sf_dir):
    """Binary media feature extraction via Arrow-batched mapInPandas
    (byte length, header bytes, checksum, integer mean intensity)."""
    docs = read_table(spark, sf_dir, "documents")
    return MM.extract_features(MM.attach_fake_media(docs))


def _frame_oracle() -> str:
    selects = "\n    UNION ALL\n    ".join(
        f"SELECT doc_id, CAST({idx} AS BIGINT) AS frame_idx, "
        f"CAST({_byte(idx)} AS BIGINT) AS frame_val FROM documents"
        for idx in range(0, MM.MEDIA_BYTES, MM.FRAME_STRIDE)
    )
    return selects


@register("multimodal_frame_sample", oracle=_frame_oracle())
def multimodal_frame_sample(spark, sf_dir):
    """Stride-4 frame sampling over binary "video" media — the
    row-exploding mapInPandas decode shape."""
    docs = read_table(spark, sf_dir, "documents")
    return MM.sample_frames(MM.attach_fake_media(docs))


def _audio_oracle() -> str:
    selects = []
    for ci in range(MM.MEDIA_BYTES // MM.AUDIO_CHUNK):
        js = range(ci * MM.AUDIO_CHUNK, (ci + 1) * MM.AUDIO_CHUNK)
        energy = " + ".join(f"({_byte(j)} * {_byte(j)})" for j in js)
        selects.append(
            f"SELECT doc_id, CAST({ci} AS BIGINT) AS chunk_idx, "
            f"CAST({MM.AUDIO_CHUNK} AS BIGINT) AS n_samples, "
            f"CAST({energy} AS BIGINT) AS energy FROM documents"
        )
    return "\n    UNION ALL\n    ".join(selects)


@register("multimodal_audio_chunks", oracle=_audio_oracle())
def multimodal_audio_chunks(spark, sf_dir):
    """Fixed-window audio segmentation with per-window integer
    energy — the VAD/feature-pipeline chunking shape, Arrow-batched."""
    docs = read_table(spark, sf_dir, "documents")
    return MM.chunk_audio(MM.attach_fake_media(docs))
