"""Audio modality plumbing: determinism, numpy-reference features,
resample arithmetic, and the explicit codec boundary."""
from __future__ import annotations

import numpy as np
import pytest

from sparkharvester.audio import (
    audio_features, decode_audio, make_audio_df, resample_audio,
    synth_samples,
)


@pytest.fixture(scope="module")
def audio_rows(spark):
    return {r["audio_id"]: r
            for r in make_audio_df(spark, n=12).collect()}


def test_payloads_deterministic_and_decodable(spark, audio_rows):
    again = {r["audio_id"]: r for r in make_audio_df(spark, n=12).collect()}
    assert set(audio_rows) == set(again) and len(audio_rows) == 12
    for aid, r in audio_rows.items():
        assert bytes(r["bytes"]) == bytes(again[aid]["bytes"])
        x = decode_audio(bytes(r["bytes"]), r["fmt"])
        assert len(x) == r["n_samples"]
        assert np.array_equal(x, synth_samples(aid, r["n_samples"],
                                               r["sample_rate"]))


def test_features_match_numpy_reference(spark, audio_rows):
    feats = {r["audio_id"]: r
             for r in audio_features(make_audio_df(spark, n=12)).collect()}
    assert set(feats) == set(audio_rows)
    for aid, f in feats.items():
        x = decode_audio(bytes(audio_rows[aid]["bytes"]), "pcm16") \
            .astype(np.float64)
        assert f["duration_s"] == pytest.approx(
            len(x) / audio_rows[aid]["sample_rate"])
        assert f["rms"] == pytest.approx(float(np.sqrt(np.mean(x * x))))
        assert f["zcr"] == pytest.approx(float(np.mean(
            np.signbit(x[1:]) != np.signbit(x[:-1]))))
        assert f["peak"] == int(np.max(np.abs(x)))
        assert 0.0 < f["zcr"] < 1.0 and f["rms"] > 0.0


def test_resample_halves_length_and_is_pcm16(spark, audio_rows):
    out = {r["audio_id"]: r
           for r in resample_audio(make_audio_df(spark, n=12),
                                   out_rate=4000).collect()}
    for aid, r in out.items():
        src = audio_rows[aid]
        assert r["sample_rate"] == 4000
        assert r["n_samples"] == (src["n_samples"] * 4000) // src["sample_rate"]
        y = decode_audio(bytes(r["bytes"]), "pcm16")
        assert len(y) == r["n_samples"]
        # nearest-sample: every output value occurs in the source
        x = decode_audio(bytes(src["bytes"]), "pcm16")
        idx = (np.arange(len(y), dtype=np.int64)
               * src["sample_rate"]) // 4000
        assert np.array_equal(y, x[np.minimum(idx, len(x) - 1)])


def test_unknown_codec_is_explicit():
    with pytest.raises(NotImplementedError):
        decode_audio(b"\x00\x01", "mp3")


def test_check_invariants_all_green(spark):
    from sparkharvester.audio import check_invariants

    rows = check_invariants(make_audio_df(spark, n=16)).collect()
    assert len(rows) == 16
    for r in rows:
        assert r["samples_equal"] and r["transcript_ok"]
        assert r["rms_positive"] and r["zcr_in_range"]
        assert r["resample_exact"]
        assert r["duration_s"] > 0.4


def test_check_invariants_catches_payload_corruption(spark):
    from pyspark.sql import functions as F

    from sparkharvester.audio import check_invariants

    src = make_audio_df(spark, n=8)
    # flip the first sample of every payload: decode still works but
    # bit-equality vs the reference synthesis must fail
    corrupted = src.withColumn(
        "bytes",
        F.concat(F.expr("X'FFFF'"), F.expr("substring(bytes, 3)")))
    rows = check_invariants(corrupted).collect()
    assert len(rows) == 8
    assert all(not r["samples_equal"] for r in rows)
    assert all(r["resample_exact"] for r in rows)  # stage still consistent
