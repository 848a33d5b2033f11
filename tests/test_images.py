"""Payload invariants (BASELINE.json input_hint): decode, PSNR, phash."""
import numpy as np

from sparkharvester.images import (
    check_invariants,
    decode_image,
    decode_png,
    encode_png,
    make_images_df,
    phash64,
    psnr,
    synth_pixels,
)


def test_png_roundtrip():
    px = synth_pixels("img-x", 13, 9)
    assert np.array_equal(decode_png(encode_png(px)), px)


def test_raw_roundtrip():
    px = synth_pixels("img-y", 8, 8)
    assert np.array_equal(decode_image(px.tobytes(), "raw", 8, 8), px)


def test_psnr_identity_and_noise():
    px = synth_pixels("img-z", 16, 16)
    assert psnr(px, px) == float("inf")
    noisy = px.copy()
    noisy[0, 0, 0] ^= 1
    assert psnr(px, noisy) > 40.0


def test_phash_deterministic_and_locality():
    px = synth_pixels("img-p", 32, 32)
    assert phash64(px) == phash64(px.copy())
    # single-pixel flip: hamming distance stays small
    noisy = px.copy()
    noisy[0, 0] = 255 - noisy[0, 0]
    d = bin((phash64(px) ^ phash64(noisy)) & ((1 << 64) - 1)).count("1")
    assert d <= 4


def test_invariants_hold_on_spark(spark):
    imgs = make_images_df(spark, n=32)
    res = check_invariants(imgs).collect()
    assert len(res) == 32
    assert all(r["pixels_equal"] for r in res)
    assert all(r["psnr_ok"] for r in res)
    assert all(r["caption_ok"] for r in res)
    assert all(r["phash_ok"] for r in res)
    fmts = {r["fmt"] for r in res}
    assert fmts == {"png", "raw"}
