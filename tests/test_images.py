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


def test_resize_images(spark):
    """decode → nearest-neighbor resize: shape, determinism, content."""
    import numpy as np

    from sparkharvester.images import (
        make_images_df, resize_images, resize_nearest, synth_pixels, phash64,
    )

    imgs = make_images_df(spark, n=12)
    out = {r["image_id"]: r for r in resize_images(imgs, 16, 16).collect()}
    assert len(out) == 12
    for img_id, r in out.items():
        assert (r["w"], r["h"]) == (16, 16)
        px = np.frombuffer(bytes(r["bytes"]), dtype=np.uint8).reshape(16, 16, 3)
        # recompute the expected resize from the deterministic source
        src_meta = [x for x in imgs.collect() if x["image_id"] == img_id][0]
        ref = resize_nearest(
            synth_pixels(img_id, src_meta["w"], src_meta["h"]), 16, 16)
        assert np.array_equal(px, ref)
        assert r["phash"] == phash64(ref)


def test_image_features(spark):
    """Per-channel histograms: 3*bins floats, each channel sums to 1."""
    from sparkharvester.images import image_features, make_images_df

    feats = image_features(make_images_df(spark, n=6), bins=8).collect()
    assert len(feats) == 6
    for r in feats:
        f = r["features"]
        assert len(f) == 24
        for c in range(3):
            assert abs(sum(f[c * 8:(c + 1) * 8]) - 1.0) < 1e-5


def test_sample_frames(spark):
    """Every k-th frame extracted; bytes decode to the synth frame."""
    import numpy as np

    from sparkharvester.images import make_videos_df, sample_frames, synth_pixels

    vids = make_videos_df(spark, n=4)
    meta = {r["video_id"]: r for r in vids.select(
        "video_id", "w", "h", "n_frames").collect()}
    frames = sample_frames(vids, every_k=5).collect()
    by_vid = {}
    for r in frames:
        by_vid.setdefault(r["video_id"], []).append(r)
    for vid, m in meta.items():
        idxs = sorted(r["frame_idx"] for r in by_vid[vid])
        assert idxs == list(range(0, m["n_frames"], 5))
        for r in by_vid[vid]:
            px = np.frombuffer(bytes(r["bytes"]), dtype=np.uint8) \
                   .reshape(m["h"], m["w"], 3)
            assert np.array_equal(
                px, synth_pixels(f"{vid}/f{r['frame_idx']}", m["w"], m["h"]))


def test_phash_hamming_pairs_over_payloads(spark):
    """Banded Hamming LSH over REAL encoded payloads: duplicate image
    bytes under new ids decode to identical pixels, hence identical
    phash64, and the bucket join surfaces exactly those pairs at
    hamming 0 — the image-dedup path of a crawl pipeline, end to end
    (payload -> decode -> phash -> LSH)."""
    from pyspark.sql import functions as F

    from sparkharvester.images import make_images_df
    from sparkharvester.q_more import phash_hamming_pairs

    imgs = make_images_df(spark, n=24)
    # byte-identical copies (same pixels, new numeric id space)
    allph = (
        imgs.select(F.expr("cast(substring(image_id, 5) as long)")
                    .alias("img_id"), F.col("phash").alias("ph"))
        .unionByName(
            imgs.filter(F.expr("cast(substring(image_id, 5) as long) % 3 = 0"))
            .select((F.expr("cast(substring(image_id, 5) as long)")
                     + F.lit(1000)).alias("img_id"),
                    F.col("phash").alias("ph"))
        )
    )
    pairs = {(r["img_a"], r["img_b"]): r["hamming"]
             for r in phash_hamming_pairs(allph, threshold=0).collect()}
    expected = {(i, i + 1000): 0 for i in range(0, 24, 3)}
    # every duplicate pair found at hamming 0; random 64-bit phashes of
    # distinct images never collide at hamming 0
    assert pairs == expected
