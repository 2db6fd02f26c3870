"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
struct metadata.  The Spark-side machinery here is real — schemas,
Arrow-batched ``mapInPandas`` decode, partition-friendly shapes.  The
codec step is import-guarded: when Pillow / soundfile are installed
(richer environments) ``decode_image``/``decode_audio`` do the real
decode and the ``decode_image_meta``/``decode_audio_samples``
operators automatically run it; in this container (no image/audio
libs) they fall back to the deterministic stand-ins
``fake_decode_meta``/``fake_decode_audio`` — same signature, same
schema, same Arrow execution shape — so the distributed plumbing is
testable end-to-end either way.  Codec selection is a plain module
function (``image_codec_available``/``audio_codec_available``) so
tests monkeypatch the imported handle and assert the choice.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # real image codec — absent in this container, present in richer envs
    from PIL import Image as _pil_image  # type: ignore
except ImportError:
    _pil_image = None

try:  # real audio codec
    import soundfile as _soundfile  # type: ignore
except ImportError:
    _soundfile = None


def image_codec_available() -> bool:
    return _pil_image is not None


def audio_codec_available() -> bool:
    return _soundfile is not None

# Output schema of the (stub) decoder — what a real image decode would emit.
DECODE_META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width bigint, height bigint, n_frames bigint"
)


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary column (here: utf-8 bytes of the text —
    the stand-in for image/audio bytes) plus content metadata."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "utf-8")).withColumn(
        "content_type", F.lit("application/octet-stream")
    )


def decode_image(payload: bytes) -> dict:
    """Real image decode via Pillow when importable; raises
    NotImplementedError in environments without an image lib (this
    container) — see fake_decode_meta for the plumbing stand-in."""
    if _pil_image is None:
        raise NotImplementedError(
            "image decoding requires e.g. Pillow; not available here"
        )
    import io

    with _pil_image.open(io.BytesIO(payload)) as img:
        return {
            "n_bytes": len(payload),
            "width": img.width,
            "height": img.height,
            "n_frames": int(getattr(img, "n_frames", 1)),
        }


def decode_audio(payload: bytes) -> dict:
    """Real audio decode via soundfile when importable; raises
    NotImplementedError otherwise — see fake_decode_audio."""
    if _soundfile is None:
        raise NotImplementedError(
            "audio decoding requires e.g. soundfile; not available here"
        )
    import io

    samples, sample_rate = _soundfile.read(io.BytesIO(payload))
    # multi-channel input arrives as (n, channels): downmix to mono so
    # the output schema (array<double>) holds for any file
    if getattr(samples, "ndim", 1) > 1:
        samples = samples.mean(axis=1)
    return {
        "sample_rate": int(sample_rate),
        "samples": [float(s) for s in samples],
    }


def fake_decode_meta(docs_with_payload: DataFrame) -> DataFrame:
    """Deterministic stand-in decoder run through ``mapInPandas`` — the
    exact execution shape of a real decoder: Arrow batches of binary in,
    typed metadata out, executed per-partition on executors."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "width": n_bytes % 640 + 16,
                    "height": (n_bytes * 7) % 480 + 16,
                    "n_frames": n_bytes % 30 + 1,
                }
            )

    parallelism = docs_with_payload.sparkSession.sparkContext.defaultParallelism
    return (
        docs_with_payload.select("doc_id", "payload")
        .repartition(parallelism)  # decode is per-row Python work: spread small files
        .mapInPandas(decode_batches, schema=DECODE_META_SCHEMA)
    )


def real_decode_meta(docs_with_payload: DataFrame) -> DataFrame:
    """Pillow-backed image metadata decode through the SAME mapInPandas
    shape as fake_decode_meta.  Only callable when Pillow is importable
    (the executors re-import it; decode_image re-checks per process)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_image(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [m["n_bytes"] for m in metas],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "n_frames": [m["n_frames"] for m in metas],
                }
            )

    parallelism = docs_with_payload.sparkSession.sparkContext.defaultParallelism
    return (
        docs_with_payload.select("doc_id", "payload")
        .repartition(parallelism)
        .mapInPandas(decode_batches, schema=DECODE_META_SCHEMA)
    )


def decode_image_meta(docs_with_payload: DataFrame) -> DataFrame:
    """The image-decode operator users call: real codec when available,
    deterministic stub otherwise — identical schema either way."""
    if image_codec_available():
        return real_decode_meta(docs_with_payload)
    return fake_decode_meta(docs_with_payload)


def frame_sample_plan(meta: DataFrame, every_nth: int = 5) -> DataFrame:
    """Frame-sampling as a lateral expansion: one row per sampled frame
    index — sequence + explode, no Python in the loop."""
    return meta.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))
        ).alias("frame_idx"),
    )


# ------------------------------------------------------------------ audio

AUDIO_SCHEMA = "doc_id bigint, sample_rate bigint, samples array<double>"


def fake_decode_audio(docs_with_payload: DataFrame) -> DataFrame:
    """Deterministic stand-in audio decoder (real one: decode_audio):
    payload bytes -> normalized samples in [-1, 1), Arrow-batched
    through mapInPandas exactly like a soundfile decode would be."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": 16000,
                    "samples": pdf["payload"].map(
                        lambda b: [(x - 128) / 128.0 for x in b]
                    ),
                }
            )

    parallelism = docs_with_payload.sparkSession.sparkContext.defaultParallelism
    return (
        docs_with_payload.select("doc_id", "payload")
        .repartition(parallelism)
        .mapInPandas(decode, schema=AUDIO_SCHEMA)
    )


def real_decode_audio(docs_with_payload: DataFrame) -> DataFrame:
    """soundfile-backed decode through the same mapInPandas shape as
    fake_decode_audio; only callable when soundfile is importable."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_audio(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": [m["sample_rate"] for m in metas],
                    "samples": [m["samples"] for m in metas],
                }
            )

    parallelism = docs_with_payload.sparkSession.sparkContext.defaultParallelism
    return (
        docs_with_payload.select("doc_id", "payload")
        .repartition(parallelism)
        .mapInPandas(decode, schema=AUDIO_SCHEMA)
    )


def decode_audio_samples(docs_with_payload: DataFrame) -> DataFrame:
    """The audio-decode operator users call: real codec when available,
    deterministic stub otherwise — identical schema either way."""
    if audio_codec_available():
        return real_decode_audio(docs_with_payload)
    return fake_decode_audio(docs_with_payload)


def audio_window_features(audio: DataFrame, window_size: int = 100) -> DataFrame:
    """Windowed audio features (RMS energy, peak) per fixed-size sample
    window: posexplode + grouped agg — the Python decode hands off to
    JVM-side aggregation immediately, so the windowing never runs in
    Python.  The +1e-9 nudges keep rounded values off half-even vs
    half-up boundaries (samples are exact k/128 binaries)."""
    s = audio.select("doc_id", F.posexplode("samples").alias("i", "s"))
    return s.groupBy(
        "doc_id", (F.col("i") / window_size).cast("long").alias("window_idx")
    ).agg(
        F.round(F.sqrt(F.avg(F.col("s") * F.col("s"))) + F.lit(1e-9), 6).alias("rms"),
        F.round(F.max(F.abs(F.col("s"))) + F.lit(1e-9), 6).alias("peak"),
        F.count("*").alias("n_samples"),
    )


# --------------------------------------------------- perceptual hashing

PHASH_GRID_W, PHASH_GRID_H = 9, 8  # 9x8 gray grid -> 64 dHash bits
_GRID_N = PHASH_GRID_W * PHASH_GRID_H
PIXEL_GRID_SCHEMA = "doc_id bigint, px array<bigint>"


def fake_pixel_grid(docs_with_payload: DataFrame) -> DataFrame:
    """Deterministic stand-in for image resize-to-grid: 72 byte samples
    of the payload at stride positions k*n//72 (0 for an empty
    payload) — the exact Arrow ``mapInPandas`` shape of a real
    PIL ``convert('L').resize((9, 8))``, and mirrored verbatim by the
    x101 SQL oracle."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def grid(b: bytes) -> list[int]:
                n = len(b)
                if n == 0:
                    return [0] * _GRID_N
                return [b[k * n // _GRID_N] for k in range(_GRID_N)]

            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "px": pdf["payload"].map(grid)}
            )

    parallelism = docs_with_payload.sparkSession.sparkContext.defaultParallelism
    return (
        docs_with_payload.select("doc_id", "payload")
        .repartition(parallelism)
        .mapInPandas(sample, schema=PIXEL_GRID_SCHEMA)
    )


def real_pixel_grid(docs_with_payload: DataFrame) -> DataFrame:
    """Pillow-backed grayscale 9x8 resample through the SAME
    mapInPandas shape; only callable when Pillow is importable."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            def grid(b: bytes) -> list[int]:
                with _pil_image.open(io.BytesIO(b)) as img:
                    small = img.convert("L").resize((PHASH_GRID_W, PHASH_GRID_H))
                    return [int(p) for p in small.getdata()]

            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "px": pdf["payload"].map(grid)}
            )

    parallelism = docs_with_payload.sparkSession.sparkContext.defaultParallelism
    return (
        docs_with_payload.select("doc_id", "payload")
        .repartition(parallelism)
        .mapInPandas(sample, schema=PIXEL_GRID_SCHEMA)
    )


def pixel_grid(docs_with_payload: DataFrame) -> DataFrame:
    """Grid resample users call: real codec when available,
    deterministic stub otherwise — identical schema either way."""
    if image_codec_available():
        return real_pixel_grid(docs_with_payload)
    return fake_pixel_grid(docs_with_payload)


def phash64(grid: DataFrame) -> DataFrame:
    """64-bit perceptual dHash from the 9x8 gray grid as FOUR 16-bit
    words in the SimHash word layout (sig[0] holds bits 0-15): bit
    j = r*8+c is set iff px[r*9+c] < px[r*9+c+1] (row-wise gradient
    sign — the standard dHash).  Pure column expressions over the
    decoded grid: the only Python in the pipeline is the codec
    batch."""
    from ..operators.dedup import SIMHASH_BAND_BITS  # 16

    def word(w: int):
        acc = F.lit(0).cast("long")
        for j in range(SIMHASH_BAND_BITS):
            bit = w * SIMHASH_BAND_BITS + j
            r, c = bit // 8, bit % 8
            gt = (
                F.element_at("px", r * PHASH_GRID_W + c + 1)
                < F.element_at("px", r * PHASH_GRID_W + c + 2)
            ).cast("long")
            acc = acc + gt * F.lit(1 << j)
        return acc

    return grid.select(
        "doc_id", F.array(*[word(w) for w in range(4)]).alias("sig")
    )


def phash_neardup_pairs(
    docs_with_payload: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    max_block_size: int = 10_000,
) -> DataFrame:
    """Image near-dup pairs by perceptual hash: decode grid (Arrow
    batch, auto-selected codec) -> dHash words (codegen) -> the SAME
    banded blocking + exact Hamming verify as text SimHash
    (dedup.hamming_band_pairs) — one dedup dataflow for every 64-bit
    signature family.  Pigeonhole recall holds at the defaults
    (hamming <= 3 < bands = 4)."""
    from ..operators.dedup import hamming_band_pairs

    sig = phash64(pixel_grid(docs_with_payload))
    return hamming_band_pairs(sig, "doc_id", max_hamming, bands, max_block_size)


# ----------------------------------------------------- audio fingerprint

AUDIO_FP_FRAMES = 65  # 65 frame energies -> 64 gradient bits


def audio_fingerprint64(audio: DataFrame) -> DataFrame:
    """64-bit audio fingerprint from decoded samples (the chromaprint
    shape): split the sample array into 65 equal frames, take each
    frame's summed |amplitude|, and set bit j iff frame j's mean
    energy < frame j+1's (energy-gradient sign) — four 16-bit words
    in the SimHash layout, ready for ``dedup.hamming_band_pairs``.

    Exactness: the stub decoder emits dyadic rationals (k/128), whose
    sums and the cross-multiplied mean comparison
    (sum_j * n_{j+1} < sum_{j+1} * n_j — no division) are exact IEEE
    doubles, so the oracle reproduces every bit.  The whole
    fingerprint is ONE let-bound column expression (energies bound
    once — Catalyst re-inlines lambda references otherwise, the
    measured O(n^2) trap)."""
    from ..operators.text import let_expr

    NF = AUDIO_FP_FRAMES

    def energies_of(s):
        n = F.size(s)
        return F.transform(
            F.sequence(F.lit(0), F.lit(NF - 1)),
            lambda k: F.struct(
                F.aggregate(
                    F.slice(
                        s,
                        (k * n / NF).cast("int") + 1,
                        ((k + 1) * n / NF).cast("int") - (k * n / NF).cast("int"),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + F.abs(x),
                ).alias("s"),
                (
                    ((k + 1) * n / NF).cast("int") - (k * n / NF).cast("int")
                ).cast("long").alias("n"),
            ),
        )

    def sig_of(e):
        def word(w):
            acc = F.lit(0).cast("long")
            for j in range(16):
                bit = w * 16 + j
                a = F.element_at(e, bit + 1)
                b = F.element_at(e, bit + 2)
                acc = acc + (a["s"] * b["n"] < b["s"] * a["n"]).cast("long") * F.lit(
                    1 << j
                )
            return acc

        return F.array(*[word(w) for w in range(4)])

    sig = let_expr(
        energies_of(F.col("samples")), lambda e: sig_of(e)
    )
    return audio.select("doc_id", sig.alias("sig"))


def audio_neardup_pairs(
    docs_with_payload: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    max_block_size: int = 10_000,
) -> DataFrame:
    """Audio near-dup pairs: decode samples (Arrow batch, auto-selected
    codec) -> energy-gradient fingerprint (codegen) -> the shared
    banded-Hamming dataflow.  The third member of the 64-bit signature
    dedup family (text SimHash, image dHash, audio energy-gradient)."""
    from ..operators.dedup import hamming_band_pairs

    sig = audio_fingerprint64(decode_audio_samples(docs_with_payload))
    return hamming_band_pairs(sig, "doc_id", max_hamming, bands, max_block_size)
