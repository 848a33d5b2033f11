"""Image+caption payload table (BASELINE.json input_hint) + invariants.

Input shape (verbatim from the input hint): Iceberg-style table
``images(image_id:string, bytes:binary, w:int, h:int, fmt:string,
caption:string, phash:int64)``.  The sandbox has no image codecs
(SURVEY.md §7.0), so payloads are (a) raw interleaved RGB bytes and
(b) stdlib PNG (zlib deflate, filter 0) — both lossless, so the
per-row invariant is EXACT decoded-pixel equality (strictly stronger
than the PSNR ≥ 40 dB bound the input hint sets for lossy formats);
captions are checked byte-equal.

All pixel work is vectorized numpy inside Arrow-batched pandas UDFs
(mapInPandas) — no per-row Python in the engine path.  At 100 TB the
decode stage is a pure map over binary columns: scales linearly,
no shuffle, and parquet only materializes the columns asked for.
"""
from __future__ import annotations

import hashlib
import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# deterministic pixel synthesis + phash (pure numpy)
# ---------------------------------------------------------------------------


def synth_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 pixel array keyed by image_id."""
    seed = int(hashlib.md5(image_id.encode()).hexdigest()[:8], 16)
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def phash64(pixels: np.ndarray) -> int:
    """64-bit average-hash: 8x8 downsampled grayscale vs its mean."""
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = (np.arange(8) * h // 8)
    xs = (np.arange(8) * w // 8)
    blocks = np.zeros((8, 8))
    for i in range(8):
        for j in range(8):
            y0, y1 = ys[i], (ys[i + 1] if i < 7 else h)
            x0, x1 = xs[j], (xs[j + 1] if j < 7 else w)
            blocks[i, j] = gray[y0:max(y1, y0 + 1), x0:max(x1, x0 + 1)].mean()
    bits = (blocks > blocks.mean()).flatten()
    v = 0
    for i, b in enumerate(bits):
        if b:
            v |= 1 << i
    # keep within signed int64
    return v - (1 << 64) if v >= (1 << 63) else v


# ---------------------------------------------------------------------------
# stdlib PNG encode/decode (filter type 0, 8-bit RGB)
# ---------------------------------------------------------------------------


def encode_png(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def decode_png(data: bytes) -> np.ndarray:
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos, w, h, idat = 8, 0, 0, b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        if tag == b"IHDR":
            w, h, bit, ctype = struct.unpack(">IIBB", body[:10])
            assert bit == 8 and ctype == 2, "only 8-bit RGB supported"
        elif tag == b"IDAT":
            idat += body
        pos += 12 + ln
    raw = zlib.decompress(idat)
    stride = w * 3 + 1
    out = np.empty((h, w, 3), dtype=np.uint8)
    prev = np.zeros(w * 3, dtype=np.uint8)
    for y in range(h):
        row = raw[y * stride:(y + 1) * stride]
        ftype, body = row[0], np.frombuffer(row[1:], dtype=np.uint8).copy()
        if ftype == 0:
            line = body
        elif ftype == 2:          # Up filter
            line = (body + prev) % 256
        else:
            raise ValueError(f"unsupported PNG filter {ftype}")
        out[y] = line.reshape(w, 3)
        prev = line
    return out


def decode_image(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    if fmt == "raw":
        return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)
    if fmt == "png":
        return decode_png(data)
    raise NotImplementedError(
        f"codec for {fmt!r} not available in this sandbox; the Spark-side "
        "plumbing (schema, batching, UDF signature) is identical for real "
        "codecs — swap decode_image for PIL/OpenCV on a cluster"
    )


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 20 * np.log10(255.0) - 10 * np.log10(mse)


# ---------------------------------------------------------------------------
# table synthesis + invariant check (Spark side)
# ---------------------------------------------------------------------------

IMAGES_SCHEMA = ("image_id string, bytes binary, w int, h int, fmt string, "
                 "caption string, phash long")


def make_images_df(spark: SparkSession, page_urls: DataFrame | None = None,
                   n: int = 64, seed: int = 42) -> DataFrame:
    """Payload table, one row per page (or per index when standalone).

    Generated with mapInPandas so synthesis scales with partitions —
    the driver never materializes pixel data.
    """
    if page_urls is None:
        base = spark.range(n).selectExpr("concat('img-', id) AS image_id")
    else:
        base = page_urls.selectExpr(
            "concat('img-', xxhash64(url)) AS image_id"
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for img_id in pdf["image_id"]:
                hseed = int(hashlib.md5(f"{seed}/{img_id}".encode())
                            .hexdigest()[:8], 16)
                w = 8 + hseed % 57
                h = 8 + (hseed >> 8) % 57
                fmt = "png" if hseed % 2 == 0 else "raw"
                px = synth_pixels(img_id, w, h)
                data = encode_png(px) if fmt == "png" else px.tobytes()
                caption = f"caption for {img_id}: synthetic {w}x{h} {fmt}"
                rows.append((img_id, data, w, h, fmt, caption, phash64(px)))
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt",
                               "caption", "phash"],
            )

    return base.mapInPandas(gen, IMAGES_SCHEMA)


# ---------------------------------------------------------------------------
# multimodal pipeline stages: resize / feature-extract / frame-sample
# (decode → transform as Arrow-batched mapInPandas; the image/audio libs
# absent from this sandbox would slot into decode_image unchanged —
# everything Spark-side below is the real plumbing)
# ---------------------------------------------------------------------------

RESIZED_SCHEMA = "image_id string, w int, h int, bytes binary, phash long"


def resize_nearest(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample (pure numpy, deterministic)."""
    ys = (np.arange(out_h) * px.shape[0]) // out_h
    xs = (np.arange(out_w) * px.shape[1]) // out_w
    return px[ys][:, xs]


def resize_images(images: DataFrame, out_w: int = 16, out_h: int = 16) -> DataFrame:
    """decode → nearest-neighbor resize → raw re-encode + new phash.

    Pure map stage over binary columns: zero shuffle, scales linearly;
    parquet scan reads only (image_id, bytes, fmt, w, h)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode_image(bytes(r.bytes), r.fmt, r.w, r.h)
                small = resize_nearest(px, out_w, out_h)
                rows.append((r.image_id, out_w, out_h,
                             small.tobytes(), phash64(small)))
            yield pd.DataFrame(rows, columns=["image_id", "w", "h",
                                              "bytes", "phash"])

    return images.select("image_id", "bytes", "fmt", "w", "h") \
                 .mapInPandas(run, RESIZED_SCHEMA)


FEATURES_SCHEMA = "image_id string, features array<float>"


def image_features(images: DataFrame, bins: int = 8) -> DataFrame:
    """Feature extraction: per-channel normalized histograms (3*bins
    floats) — a real pixel-level featurizer with no ML dependency; a
    cluster swaps the body for a model forward pass, the Spark plumbing
    (schema, batching, column pruning) is identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        edges = np.linspace(0, 256, bins + 1)
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode_image(bytes(r.bytes), r.fmt, r.w, r.h)
                feat: list[float] = []
                npix = float(px.shape[0] * px.shape[1])
                for c in range(3):
                    hist, _ = np.histogram(px[:, :, c], bins=edges)
                    feat.extend((hist / npix).astype(np.float32).tolist())
                rows.append((r.image_id, feat))
            yield pd.DataFrame(rows, columns=["image_id", "features"])

    return images.select("image_id", "bytes", "fmt", "w", "h") \
                 .mapInPandas(run, FEATURES_SCHEMA)


VIDEOS_SCHEMA = ("video_id string, bytes binary, w int, h int, "
                 "n_frames int, fps double")
FRAMES_SCHEMA = "video_id string, frame_idx int, bytes binary, w int, h int"


def make_videos_df(spark: SparkSession, n: int = 8, seed: int = 42) -> DataFrame:
    """Synthetic raw 'video' payloads: n_frames concatenated RGB frames
    (the codec-less stand-in for a real container; frame geometry in
    typed metadata per the input-hint pattern)."""

    base = spark.range(n).selectExpr("concat('vid-', id) AS video_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid in pdf["video_id"]:
                hs = int(hashlib.md5(f"{seed}/{vid}".encode()).hexdigest()[:8], 16)
                w, h = 8 + hs % 25, 8 + (hs >> 8) % 25
                nf = 6 + hs % 20
                frames = [synth_pixels(f"{vid}/f{i}", w, h) for i in range(nf)]
                rows.append((vid, b"".join(f.tobytes() for f in frames),
                             w, h, nf, 24.0))
            yield pd.DataFrame(rows, columns=["video_id", "bytes", "w", "h",
                                              "n_frames", "fps"])

    return base.mapInPandas(gen, VIDEOS_SCHEMA)


def sample_frames(videos: DataFrame, every_k: int = 5) -> DataFrame:
    """Frame sampling: slice every k-th frame out of the raw payload —
    one input row fans out to ceil(n_frames/k) image rows.  Map-only
    (mapInPandas may emit more rows than it consumes), no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                stride = r.w * r.h * 3
                raw = bytes(r.bytes)
                for i in range(0, r.n_frames, every_k):
                    rows.append((r.video_id, i,
                                 raw[i * stride:(i + 1) * stride], r.w, r.h))
            yield pd.DataFrame(rows, columns=["video_id", "frame_idx",
                                              "bytes", "w", "h"])

    return videos.select("video_id", "bytes", "w", "h", "n_frames") \
                 .mapInPandas(run, FRAMES_SCHEMA)


INVARIANT_SCHEMA = ("image_id string, fmt string, pixels_equal boolean, "
                    "psnr_db double, psnr_ok boolean, caption_ok boolean, "
                    "phash_ok boolean")


def check_invariants(images: DataFrame, seed: int = 42) -> DataFrame:
    """Per-row invariant vs the reference decode (input_hint): decoded
    pixels match exactly (lossless) / PSNR ≥ 40 dB (lossy), caption
    byte-equality, phash reproducibility."""

    def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                px = decode_image(bytes(r.bytes), r.fmt, r.w, r.h)
                ref = synth_pixels(r.image_id, r.w, r.h)
                eq = bool(np.array_equal(px, ref))
                p = psnr(px, ref)
                cap_ok = r.caption == (
                    f"caption for {r.image_id}: synthetic {r.w}x{r.h} {r.fmt}"
                )
                out.append((r.image_id, r.fmt, eq, p if np.isfinite(p) else 999.0,
                            bool(p >= 40.0), cap_ok,
                            bool(phash64(px) == r.phash)))
            yield pd.DataFrame(
                out, columns=["image_id", "fmt", "pixels_equal", "psnr_db",
                              "psnr_ok", "caption_ok", "phash_ok"],
            )

    return images.mapInPandas(check, INVARIANT_SCHEMA)


# ---------------------------------------------------------------------------
# dup-injected corpus + pixel-level near-dup verification
# (the image twin of q_dedup's LSH -> exact-Jaccard verify: phash-banded
# candidates are cheap but cannot tell exact copies from perturbed
# near-copies — only decoding both payloads can)
# ---------------------------------------------------------------------------

DUP_EVERY = 4       # every 4th base image gets injected duplicates
NEAR_STEP = 64      # near-copy perturbation: +1 on every 64th pixel


def make_images_with_dups(spark: SparkSession, n: int = 64,
                          seed: int = 42) -> DataFrame:
    """Images table with deterministic injected duplicates: every
    DUP_EVERY-th base image also yields

    * ``<id>-xc`` — an EXACT-pixel copy re-encoded in the other format
      (png <-> raw): different bytes, identical pixels, identical phash;
    * ``<id>-nc`` — a NEAR copy (+1 on every NEAR_STEP-th byte of the
      pixel buffer, clipped): PSNR ~ 66 dB, phash within a bit or two.

    mapInPandas like make_images_df — pixels never on the driver."""
    base = spark.range(n).selectExpr("concat('img-', id) AS image_id",
                                     "id AS idx")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for img_id, idx in zip(pdf["image_id"], pdf["idx"]):
                hseed = int(hashlib.md5(f"{seed}/{img_id}".encode())
                            .hexdigest()[:8], 16)
                w = 8 + hseed % 57
                h = 8 + (hseed >> 8) % 57
                fmt = "png" if hseed % 2 == 0 else "raw"
                px = synth_pixels(img_id, w, h)
                data = encode_png(px) if fmt == "png" else px.tobytes()
                cap = f"caption for {img_id}: synthetic {w}x{h} {fmt}"
                rows.append((img_id, data, w, h, fmt, cap, phash64(px)))
                if idx % DUP_EVERY == 0:
                    ofmt = "raw" if fmt == "png" else "png"
                    odata = px.tobytes() if ofmt == "raw" else encode_png(px)
                    rows.append((f"{img_id}-xc", odata, w, h, ofmt,
                                 cap, phash64(px)))
                    buf = px.reshape(-1).copy()
                    sel = np.arange(0, buf.size, NEAR_STEP)
                    buf[sel] = np.minimum(buf[sel].astype(np.int32) + 1,
                                          255).astype(np.uint8)
                    npx = buf.reshape(h, w, 3)
                    rows.append((f"{img_id}-nc", npx.tobytes(), w, h, "raw",
                                 cap, phash64(npx)))
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt",
                               "caption", "phash"])

    return base.mapInPandas(gen, IMAGES_SCHEMA)


PIXEL_VERIFY_SCHEMA = ("img_a string, img_b string, hamming int, "
                       "pixels_equal boolean, psnr_db double, "
                       "verdict string")


def pixel_verify_pairs(images: DataFrame, pairs: DataFrame,
                       psnr_near: float = 40.0) -> DataFrame:
    """Verify phash-candidate pairs at the PIXEL level: join both
    payloads, decode, and classify —

    * ``exact``  pixels identical (byte/codec changes invisible),
    * ``near``   PSNR >= psnr_near (the input_hint lossy threshold),
    * ``reject`` a phash collision that pixel evidence refutes.

    ``pairs`` is any ``(img_a, img_b, hamming)`` candidate table (e.g.
    q_more.phash_hamming_pairs over the real phash column).  The two
    payload joins are plain shuffle hash joins on image_id — at 10^10
    images the candidate side is LSH-bounded, never all-pairs — and the
    decode+PSNR pass is zero-shuffle mapInPandas on the joined rows.
    Mismatched dimensions classify as reject without decoding."""
    a = images.select(F.col("image_id").alias("img_a"),
                      F.col("bytes").alias("bytes_a"),
                      F.col("fmt").alias("fmt_a"),
                      F.col("w").alias("w_a"), F.col("h").alias("h_a"))
    b = images.select(F.col("image_id").alias("img_b"),
                      F.col("bytes").alias("bytes_b"),
                      F.col("fmt").alias("fmt_b"),
                      F.col("w").alias("w_b"), F.col("h").alias("h_b"))
    j = pairs.join(a, "img_a").join(b, "img_b")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.w_a != r.w_b or r.h_a != r.h_b:
                    rows.append((r.img_a, r.img_b, int(r.hamming),
                                 False, 0.0, "reject"))
                    continue
                pa = decode_image(bytes(r.bytes_a), r.fmt_a, r.w_a, r.h_a)
                pb = decode_image(bytes(r.bytes_b), r.fmt_b, r.w_b, r.h_b)
                eq = bool(np.array_equal(pa, pb))
                p = psnr(pa, pb)
                p = p if np.isfinite(p) else 999.0
                verdict = ("exact" if eq
                           else "near" if p >= psnr_near else "reject")
                rows.append((r.img_a, r.img_b, int(r.hamming), eq, p,
                             verdict))
            yield pd.DataFrame(rows, columns=[
                "img_a", "img_b", "hamming", "pixels_equal", "psnr_db",
                "verdict"])

    return j.mapInPandas(run, PIXEL_VERIFY_SCHEMA)
