"""Audio modality: opaque binary payloads + typed metadata, processed
as Arrow-batched mapInPandas stages (SURVEY §2.13 multimodal columns —
the audio sibling of images.py; reference repo has no audio support, so
this whole module is beyond-reference training-pipeline capability).

Same codec boundary as images.decode_image: the sandbox has no audio
libraries, so the only real decoder is uncompressed little-endian
PCM16; any compressed fmt raises NotImplementedError.  Everything
Spark-side — schema, column pruning, batch shape, zero-shuffle map
stages — is the genuine plumbing a cluster with libsndfile/ffmpeg
would run unchanged.
"""
from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

AUDIO_SCHEMA = ("audio_id string, bytes binary, sample_rate int, "
                "n_samples int, fmt string, transcript string")


def synth_samples(audio_id: str, n: int, rate: int) -> np.ndarray:
    """Deterministic PCM16 mono clip: two md5-seeded sine partials plus
    md5-counter noise — content depends only on audio_id."""
    hs = int(hashlib.md5(audio_id.encode()).hexdigest()[:16], 16)
    f1 = 110.0 + (hs & 0xFFFF) % 1200
    f2 = 110.0 + ((hs >> 16) & 0xFFFF) % 1200
    t = np.arange(n, dtype=np.float64) / rate
    wave = 0.5 * np.sin(2 * np.pi * f1 * t) + 0.3 * np.sin(2 * np.pi * f2 * t)
    rng = np.random.default_rng(hs & 0x7FFFFFFF)
    wave += 0.05 * rng.standard_normal(n)
    return np.clip(wave * 20000.0, -32768, 32767).astype("<i2")


def decode_audio(data: bytes, fmt: str) -> np.ndarray:
    """PCM16 payload -> int16 sample vector.

    The codec boundary (images.decode_image:111-120 pattern): real
    codecs slot in here; the sandbox has none, so anything but raw
    PCM16 is an explicit NotImplementedError, never a silent wrong
    answer."""
    if fmt == "pcm16":
        return np.frombuffer(data, dtype="<i2")
    raise NotImplementedError(
        f"audio codec {fmt!r} not available in this sandbox; swap "
        "decode_audio for soundfile/ffmpeg on a cluster — the Spark-side "
        "plumbing (schema, batching, UDF signature) is identical"
    )


def make_audio_df(spark: SparkSession, n: int = 48, seed: int = 42,
                  rate: int = 8000) -> DataFrame:
    """Synthetic audio payload table, mapInPandas-generated so samples
    never touch the driver (images.make_images_df device)."""
    base = spark.range(n).selectExpr("concat('aud-', id) AS audio_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid in pdf["audio_id"]:
                hs = int(hashlib.md5(f"{seed}/{aid}".encode())
                         .hexdigest()[:8], 16)
                ns = rate // 2 + hs % (2 * rate)    # 0.5 - 2.5 s
                samples = synth_samples(aid, ns, rate)
                rows.append((aid, samples.tobytes(), rate, ns, "pcm16",
                             f"transcript for {aid}: synthetic clip"))
            yield pd.DataFrame(rows, columns=[
                "audio_id", "bytes", "sample_rate", "n_samples", "fmt",
                "transcript"])

    return base.mapInPandas(gen, AUDIO_SCHEMA)


AUDIO_FEATURES_SCHEMA = ("audio_id string, duration_s double, rms double, "
                         "zcr double, peak int, clipped boolean")


def audio_features(audio: DataFrame) -> DataFrame:
    """Per-clip loudness/activity features: duration, RMS, zero-crossing
    rate, peak amplitude, clipping flag — the audio-curation gates a
    training pipeline filters on (silence, clipping, truncation).
    Pure map stage: zero shuffle, scan pruned to the payload columns;
    a model featurizer (wav2vec etc.) swaps in with the same shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                x = decode_audio(bytes(r.bytes), r.fmt).astype(np.float64)
                n = len(x)
                rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
                zcr = (float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                       if n > 1 else 0.0)
                peak = int(np.max(np.abs(x))) if n else 0
                rows.append((r.audio_id, n / r.sample_rate, rms, zcr,
                             peak, peak >= 32767))
            yield pd.DataFrame(rows, columns=[
                "audio_id", "duration_s", "rms", "zcr", "peak", "clipped"])

    return audio.select("audio_id", "bytes", "fmt", "sample_rate") \
                .mapInPandas(run, AUDIO_FEATURES_SCHEMA)


RESAMPLED_SCHEMA = ("audio_id string, bytes binary, sample_rate int, "
                    "n_samples int, fmt string")


def resample_audio(audio: DataFrame, out_rate: int = 4000) -> DataFrame:
    """Nearest-sample resample to a uniform rate (the images.resize
    analog: deterministic index arithmetic, no interpolation kernel
    dependency).  Map-only, new payload re-encoded as PCM16."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                x = decode_audio(bytes(r.bytes), r.fmt)
                out_n = max(1, (len(x) * out_rate) // r.sample_rate)
                idx = (np.arange(out_n, dtype=np.int64)
                       * r.sample_rate) // out_rate
                y = x[np.minimum(idx, len(x) - 1)]
                rows.append((r.audio_id, y.astype("<i2").tobytes(),
                             out_rate, out_n, "pcm16"))
            yield pd.DataFrame(rows, columns=[
                "audio_id", "bytes", "sample_rate", "n_samples", "fmt"])

    return audio.select("audio_id", "bytes", "fmt", "sample_rate") \
                .mapInPandas(run, RESAMPLED_SCHEMA)


AUDIO_INVARIANT_SCHEMA = (
    "audio_id string, fmt string, samples_equal boolean, "
    "duration_s double, rms_positive boolean, zcr_in_range boolean, "
    "transcript_ok boolean, resample_exact boolean"
)


def check_invariants(audio: DataFrame, out_rate: int = 4000) -> DataFrame:
    """Per-clip invariants vs the reference synthesis (the
    images.check_invariants sibling): PCM16 decode reproduces
    synth_samples bit-exactly (lossless codec contract), transcript
    byte-equality, loudness features in their physical ranges, and the
    resample_audio STAGE's actual payload verified against the
    nearest-sample arithmetic recomputed from the source clip.

    The resample check joins the stage output back on audio_id — an
    independent re-derivation, not a tautology — then a single map
    pass verifies everything; samples never reach the driver."""
    def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                x = decode_audio(bytes(r.bytes), r.fmt)
                ref = synth_samples(r.audio_id, r.n_samples, r.sample_rate)
                eq = bool(len(x) == r.n_samples and np.array_equal(x, ref))
                xf = x.astype(np.float64)
                rms = float(np.sqrt(np.mean(xf * xf))) if len(xf) else 0.0
                zcr = (float(np.mean(np.signbit(xf[1:])
                                     != np.signbit(xf[:-1])))
                       if len(xf) > 1 else 0.0)
                t_ok = r.transcript == (
                    f"transcript for {r.audio_id}: synthetic clip")
                # expected resample, re-derived from the SOURCE payload
                out_n = max(1, (len(x) * out_rate) // r.sample_rate)
                idx = (np.arange(out_n, dtype=np.int64)
                       * r.sample_rate) // out_rate
                expect = x[np.minimum(idx, len(x) - 1)].astype("<i2")
                rs_ok = bool(r.rs_n == out_n
                             and bytes(r.rs_bytes) == expect.tobytes())
                out.append((r.audio_id, r.fmt, eq,
                            len(x) / r.sample_rate, rms > 0.0,
                            0.0 < zcr < 1.0, t_ok, rs_ok))
            yield pd.DataFrame(out, columns=[
                "audio_id", "fmt", "samples_equal", "duration_s",
                "rms_positive", "zcr_in_range", "transcript_ok",
                "resample_exact"])

    from pyspark.sql import functions as F
    rs = resample_audio(audio, out_rate=out_rate).select(
        "audio_id", F.col("bytes").alias("rs_bytes"),
        F.col("n_samples").alias("rs_n"))
    return audio.join(rs, "audio_id").mapInPandas(
        check, AUDIO_INVARIANT_SCHEMA)
