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
    # coalesce: a null-text document still gets deterministic
    # synthetic media (md5(NULL) is NULL -> unhex NULL -> the pandas
    # decoder crashes on None bytes; string-null differential, r10)
    h = "md5(coalesce(text, ''))"
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
    """REAL decode for compressed codecs (JPEG/WebP/video) — STUB.
    The container ships no image codecs (no PIL/opencv); on a real
    cluster install pillow on executors and replace the body of
    ``batches`` with ``Image.open(BytesIO(b))``. PNG, 24-bit BMP and
    PCM WAV do NOT need this path: operators/codecs.py decodes those
    with the standard library and :func:`extract_real_features` /
    :func:`wav_features` below run them end-to-end (encode → binary
    column → Arrow-batched decode), oracle-verified."""
    try:
        import PIL  # noqa: F401
    except ImportError as exc:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "JPEG/video decode requires pillow/ffmpeg on executors; "
            "PNG/BMP/WAV are fully decoded via operators/codecs.py "
            "(extract_real_features, wav_features)"
        ) from exc
    raise NotImplementedError("real decode path not wired in this container")


# ---------------------------------------------------------------------------
# Real-container decode path (PNG/BMP/WAV via operators/codecs.py).
#
# Fixture media is a deterministic pixel/sample grid derived from
# doc_id, so a pure-SQL oracle can recompute every feature without
# decoding — while the Spark side round-trips through REAL containers
# (PNG with all five scanline filters, bottom-up padded BMP, PCM WAV).
# The constants below are shared with the oracle SQL builders in
# queries/multimodal.py; change them together.
# ---------------------------------------------------------------------------

#: image dims: w = doc_id % IMG_W_MOD + IMG_MIN, h = doc_id % IMG_H_MOD + IMG_MIN
IMG_W_MOD, IMG_H_MOD, IMG_MIN = 13, 11, 4
#: pixel value = (doc_id*7 + x*3 + y*5 + c*11) % PIX_MOD, 3 channels
PIX_MOD = 251
#: audio: n = doc_id % WAV_N_MOD + WAV_N_MIN samples at WAV_RATE Hz,
#: sample i = (doc_id*31 + i*17) % 4096 - 2048
WAV_N_MOD, WAV_N_MIN, WAV_RATE = 57, 8, 8000

REAL_FEATURE_SCHEMA = (
    "doc_id long, container string, width int, height int, "
    "channels int, pixel_sum long, mean_milli long"
)
RESIZED_SCHEMA = "doc_id long, resized_sum long, resized_mean_milli long"
WAV_FEATURE_SCHEMA = (
    "doc_id long, n_samples long, sample_rate int, duration_us long, "
    "sum_abs long, energy long"
)


def _grid_image(doc_id: int):
    """The deterministic fixture image for one doc."""
    import numpy as np

    w = doc_id % IMG_W_MOD + IMG_MIN
    h = doc_id % IMG_H_MOD + IMG_MIN
    xs = np.arange(w, dtype=np.int64)
    ys = np.arange(h, dtype=np.int64)
    cs = np.arange(3, dtype=np.int64)
    val = (
        doc_id * 7
        + 3 * xs[None, :, None]
        + 5 * ys[:, None, None]
        + 11 * cs[None, None, :]
    ) % PIX_MOD
    return val.astype("uint8")


def _grid_audio(doc_id: int):
    """The deterministic fixture waveform for one doc."""
    import numpy as np

    n = doc_id % WAV_N_MOD + WAV_N_MIN
    i = np.arange(n, dtype=np.int64)
    return ((doc_id * 31 + 17 * i) % 4096 - 2048).astype("<i2")


def generate_media(docs: DataFrame) -> DataFrame:
    """Encode the fixture grid into REAL containers per doc: PNG for
    odd doc_ids (cycling all five scanline filters; every other PNG
    — doc_id % 4 == 1 — written Adam7 INTERLACED so the registered
    decode queries exercise both stream layouts end-to-end), 24-bit
    BMP for even, plus a baseline JPEG of the same grid (color for
    odd ids, grayscale channel-0 for even — both JPEG component
    layouts) and a PCM WAV of the fixture waveform — an
    Arrow-batched generation stage (each executor encodes its own
    partition; no driver-side loop). Interlacing is layout, not
    content: decoded pixels are identical, so every pixel-derived
    oracle is unchanged."""
    from etl_jobs_spark.operators import codecs as C

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                img = _grid_image(d)
                media = (
                    C.encode_png(img, interlace=(d % 4 == 1))
                    if d % 2 == 1
                    else C.encode_bmp(img)
                )
                # progressive for d % 4 in {0, 1} → all four
                # (layout × scan-type) cells appear across ids:
                # odd/color × prog+seq, even/gray × prog+seq.
                # Progressive recomposes exact coefficients, so
                # decoded pixels — and every oracle — are unchanged.
                jpeg = C.encode_jpeg(
                    img if d % 2 == 1 else img[:, :, :1],
                    progressive=(d % 4 < 2),
                )
                rows.append(
                    (
                        d,
                        "png" if d % 2 == 1 else "bmp",
                        media,
                        jpeg,
                        C.encode_wav(_grid_audio(d), WAV_RATE),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "container", "media", "jpeg", "audio"],
            )

    return docs.select("doc_id").mapInPandas(
        batches,
        schema="doc_id long, container string, media binary, "
        "jpeg binary, audio binary",
    )


def extract_real_features(media_df: DataFrame) -> DataFrame:
    """Sniff + decode real PNG/BMP containers (operators/codecs.py)
    and extract integer image features. Everything after the Arrow
    transfer is per-partition numpy — no shuffle until the feature
    rows (7 small columns) aggregate downstream."""
    from etl_jobs_spark.operators import codecs as C

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, container, blob in zip(
                pdf["doc_id"], pdf["container"], pdf["media"]
            ):
                img = C.decode_image(bytes(blob))
                h, w, ch = img.shape
                s = int(img.sum(dtype="int64"))
                rows.append(
                    (
                        int(doc_id),
                        container,
                        w,
                        h,
                        ch,
                        s,
                        s * 1000 // (w * h * ch * 255),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "container",
                    "width",
                    "height",
                    "channels",
                    "pixel_sum",
                    "mean_milli",
                ],
            )

    return media_df.select("doc_id", "container", "media").mapInPandas(
        batches, schema=REAL_FEATURE_SCHEMA
    )


JPEG_FEATURE_SCHEMA = (
    "doc_id long, container string, width int, height int, "
    "channels int, n_blocks long, roundtrip_ok long"
)


def jpeg_roundtrip_features(media_df: DataFrame) -> DataFrame:
    """Decode REAL baseline JPEG containers (operators/codecs.py —
    from-scratch Huffman + IDCT, tables read from the file) and
    verify the decode against the closed-form fixture grid each blob
    was encoded from: roundtrip_ok is 1 iff every decoded pixel is
    within codecs.JPEG_MAX_ABS_ERR of the source (the Q=1 DCT +
    YCbCr rounding bound). JPEG is lossy, so unlike the PNG/BMP
    path the oracle cannot recompute pixel sums — instead it pins
    the header-derived geometry (width/height/channels/block count)
    closed-form and requires the error-bound flag to hold, which a
    broken Huffman table, filter, or IDCT blows immediately. Arrow-
    batched mapInPandas; only 7 small columns leave the stage."""
    import numpy as np

    from etl_jobs_spark.operators import codecs as C

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["jpeg"]):
                d = int(doc_id)
                img = C.decode_jpeg(bytes(blob))
                h, w, ch = img.shape
                ref = _grid_image(d)
                if ch == 1:
                    ref = ref[:, :, :1]
                ok = (
                    ref.shape == img.shape
                    and int(
                        np.abs(
                            img.astype(np.int64) - ref.astype(np.int64)
                        ).max()
                    )
                    <= C.JPEG_MAX_ABS_ERR
                )
                rows.append(
                    (
                        d,
                        "jpeg",
                        w,
                        h,
                        ch,
                        -(-w // 8) * -(-h // 8) * ch,
                        1 if ok else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "container",
                    "width",
                    "height",
                    "channels",
                    "n_blocks",
                    "roundtrip_ok",
                ],
            )

    return media_df.select("doc_id", "jpeg").mapInPandas(
        batches, schema=JPEG_FEATURE_SCHEMA
    )


def extract_resized_features(
    media_df: DataFrame, out_w: int = 4, out_h: int = 4
) -> DataFrame:
    """Decode → nearest-neighbor resize (integer floor index map) →
    integer features; the thumbnail/preprocess shape of an image
    training pipeline, fully oracle-checkable."""
    from etl_jobs_spark.operators import codecs as C

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                small = C.resize_nearest(
                    C.decode_image(bytes(blob)), out_w, out_h
                )
                s = int(small.sum(dtype="int64"))
                rows.append(
                    (
                        int(doc_id),
                        s,
                        s * 1000 // (out_w * out_h * small.shape[2] * 255),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "resized_sum", "resized_mean_milli"]
            )

    return media_df.select("doc_id", "media").mapInPandas(
        batches, schema=RESIZED_SCHEMA
    )


def wav_features(media_df: DataFrame) -> DataFrame:
    """Decode real PCM WAV containers and extract integer waveform
    features (duration, sum |x|, energy)."""
    import numpy as np

    from etl_jobs_spark.operators import codecs as C

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["audio"]):
                samples, rate = C.decode_wav(bytes(blob))
                x = samples.astype("int64")
                rows.append(
                    (
                        int(doc_id),
                        len(x),
                        rate,
                        len(x) * 1_000_000 // rate,
                        int(np.abs(x).sum()),
                        int((x * x).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_samples",
                    "sample_rate",
                    "duration_us",
                    "sum_abs",
                    "energy",
                ],
            )

    return media_df.select("doc_id", "audio").mapInPandas(
        batches, schema=WAV_FEATURE_SCHEMA
    )


DOWNSAMPLE_SCHEMA = (
    "doc_id long, n_in long, n_out long, rate_out int, "
    "sum_abs_ds long, energy_ds long"
)


def wav_downsample_features(media_df: DataFrame, stride: int) -> DataFrame:
    """Decode PCM WAV containers and DECIMATE by ``stride`` (keep
    every stride-th sample — integer downsampling, the cheap resample
    when the target rate divides the source rate), then reduce the
    downsampled waveform to integer features. Arrow-batched
    mapInPandas like the other codec stages: decode cost is
    per-partition map work, nothing shuffles but the tiny feature
    rows."""
    import numpy as np

    from etl_jobs_spark.operators import codecs as C

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["audio"]):
                samples, rate = C.decode_wav(bytes(blob))
                x = samples.astype("int64")
                ds = x[::stride]
                rows.append(
                    (
                        int(doc_id),
                        len(x),
                        len(ds),
                        rate // stride,
                        int(np.abs(ds).sum()),
                        int((ds * ds).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_in",
                    "n_out",
                    "rate_out",
                    "sum_abs_ds",
                    "energy_ds",
                ],
            )

    return media_df.select("doc_id", "audio").mapInPandas(
        batches, schema=DOWNSAMPLE_SCHEMA
    )


HIST_SCHEMA = "doc_id long, bucket int, n_px long"


def image_histogram(media_df: DataFrame, n_buckets: int = 4) -> DataFrame:
    """Decode real PNG/BMP containers and reduce each image to an
    intensity histogram (equal-width buckets over the 0..255 byte
    range, all channels pooled) — the exposure/contrast profile a
    media curation gate filters on. Same shape as every codec
    stage: Arrow-batched per-partition decode; only (doc, bucket,
    count) rows shuffle."""
    import numpy as np

    from etl_jobs_spark.operators import codecs as C

    width = 256 // n_buckets

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                img = C.decode_image(bytes(blob))
                # Clamp into the last bucket: when n_buckets does not
                # divide 256, intensities >= n_buckets*width would
                # otherwise land in a silently-dropped overflow bucket
                # and per-image counts would no longer sum to W*H*C.
                idx = np.minimum(img.reshape(-1) // width, n_buckets - 1)
                counts = np.bincount(idx, minlength=n_buckets)
                rows.extend(
                    (int(doc_id), int(b), int(c))
                    for b, c in enumerate(counts[:n_buckets])
                )
            yield pd.DataFrame(rows, columns=["doc_id", "bucket", "n_px"])

    return media_df.select("doc_id", "media").mapInPandas(
        batches, schema=HIST_SCHEMA
    )


#: Frame width (samples) and mean-square silence threshold for
#: wav_frame_energy. Fixture samples span ±2048, so x² means land
#: around 1.4e6 — a 1e6 cut yields genuinely mixed silence flags.
WAV_FRAME = 16
WAV_SILENCE_MS = 1_000_000


def wav_frame_energy(media_df: DataFrame) -> DataFrame:
    """Decode PCM WAV containers and reduce each to FRAME-level
    energy features: the waveform splits into fixed WAV_FRAME-sample
    frames (last frame ragged), each frame's mean-square energy is
    an exact integer (sum of squares DIV frame length), and the doc
    row reports frame count, silent-frame count (ms energy below
    WAV_SILENCE_MS — the VAD-style silence gate a speech curation
    pipeline cuts on), peak frame energy, and total energy. Same
    Arrow-batched mapInPandas shape as every codec stage; only the
    5-column integer rows shuffle."""
    from etl_jobs_spark.operators import codecs as C

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["audio"]):
                samples, _rate = C.decode_wav(bytes(blob))
                x = samples.astype("int64")
                ms = [
                    int((f * f).sum()) // len(f)
                    for f in (
                        x[i : i + WAV_FRAME]
                        for i in range(0, len(x), WAV_FRAME)
                    )
                ]
                rows.append(
                    (
                        int(doc_id),
                        len(ms),
                        sum(1 for e in ms if e < WAV_SILENCE_MS),
                        max(ms) if ms else 0,
                        int((x * x).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_frames",
                    "n_silent",
                    "peak_frame_ms",
                    "total_energy",
                ],
            )

    return media_df.select("doc_id", "audio").mapInPandas(
        batches,
        schema="doc_id long, n_frames long, n_silent long, "
        "peak_frame_ms long, total_energy long",
    )


#: ViT-style patch width (square patches, full patches only — the
#: fixture images are 4..16 px, so 1-4 patches per axis).
PATCH_W = 4


def image_patches(media_df: DataFrame) -> DataFrame:
    """Decode real PNG/BMP containers and slice each image into
    non-overlapping PATCH_W x PATCH_W patches — the
    vision-transformer tokenization step (images become patch
    sequences before embedding). Per patch: exact integer pixel sum
    (all channels) and milli-mean. Ragged right/bottom edges are
    dropped, matching the resize-to-multiple convention. Same
    Arrow-batched shape as every codec stage; only the small patch
    rows shuffle."""
    import numpy as np

    from etl_jobs_spark.operators import codecs as C

    P = PATCH_W

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                img = C.decode_image(bytes(blob)).astype(np.int64)
                h, w, c = img.shape
                for py in range(h // P):
                    for px in range(w // P):
                        block = img[py * P:(py + 1) * P, px * P:(px + 1) * P, :]
                        s = int(block.sum())
                        rows.append(
                            (
                                int(doc_id),
                                py,
                                px,
                                s,
                                s * 1000 // (P * P * c),
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "py", "px", "px_sum", "mean_milli"],
            )

    return media_df.select("doc_id", "media").mapInPandas(
        batches,
        schema="doc_id long, py long, px long, px_sum long, "
        "mean_milli long",
    )


def image_dhash(media_df: DataFrame) -> DataFrame:
    """Perceptual difference-hash (dHash) per image: decode, integer
    grayscale ((r+g+b) DIV 3), nearest-neighbor resample to 9x8,
    then 64 horizontal gradient signs — split into two 32-bit
    halves (dhash_hi, dhash_lo) so the top bit never overflows a
    signed BIGINT in either engine. dHash is brightness-shift
    invariant (the property that makes it the image near-dup
    detector: re-encodes, gamma tweaks, and exposure changes keep
    the gradient signs), and every step here is integer arithmetic,
    so the closed-form fixture oracle reproduces each bit."""
    import numpy as np

    from etl_jobs_spark.operators import codecs as C

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                img = C.decode_image(bytes(blob)).astype(np.int64)
                h, w, _ = img.shape
                gray = img.sum(axis=2) // 3  # (h, w)
                xs = (np.arange(9) * w) // 9
                ys = (np.arange(8) * h) // 8
                g = gray[np.ix_(ys, xs)]  # (8, 9)
                bits = (g[:, 1:] > g[:, :-1]).astype(np.int64)  # (8, 8)
                lo = hi = 0
                for j in range(8):
                    for i in range(8):
                        k = j * 8 + i
                        if bits[j, i]:
                            if k < 32:
                                lo |= 1 << k
                            else:
                                hi |= 1 << (k - 32)
                rows.append((int(doc_id), hi, lo))
            yield pd.DataFrame(
                rows, columns=["doc_id", "dhash_hi", "dhash_lo"]
            )

    return media_df.select("doc_id", "media").mapInPandas(
        batches, schema="doc_id long, dhash_hi long, dhash_lo long"
    )


def audio_fingerprint(media_df: DataFrame) -> DataFrame:
    """Transition-sign audio fingerprint: decode PCM WAV and take
    the SIGNS of up to 32 successive sample transitions as a bit
    fingerprint — the shape-not-level audio analogue of image
    dHash (gain changes and DC offsets keep the signs; the
    zero-crossing structure is what collides for re-encoded/
    re-leveled copies). Integer end-to-end."""
    import numpy as np

    from etl_jobs_spark.operators import codecs as C

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["audio"]):
                samples, _rate = C.decode_wav(bytes(blob))
                x = samples.astype(np.int64)
                k = max(0, min(len(x) - 1, 32))
                fp = 0
                for i in range(k):
                    if x[i + 1] > x[i]:
                        fp |= 1 << i
                rows.append((int(doc_id), fp, k))
            yield pd.DataFrame(rows, columns=["doc_id", "fp", "n_bits"])

    return media_df.select("doc_id", "audio").mapInPandas(
        batches, schema="doc_id long, fp long, n_bits long"
    )
