"""Image perceptual hashing (operators/multimodal.py:phash64/image_phash)
and the generic banded Hamming join (operators/dedup.py:hamming_near_dup):
re-encoded / lightly-noised / resized copies of one image must collide
within a few bits, distinct images must not, and the container must not
matter — the multimodal near-dup path built on the round-3 real pixel
decoders.

Fixtures are bilinearly-upsampled random coarse grids: like natural
photos (and unlike synthetic gradients/sinusoids) every low-frequency
DCT coefficient carries substantial independent energy, so the
median-threshold bits are decided by wide margins — pHash's robustness
assumption. On pure high-frequency sawtooth fixtures the low-freq
coefficients all tie near zero and ±2 pixel noise flips ~20/64 bits;
that is a property of the input spectrum, not a defect of the hash.
"""

from __future__ import annotations

import random

import numpy as np

from etdtransform_spark.operators.dedup import hamming_near_dup
from etdtransform_spark.operators.multimodal import image_phash, phash64
from test_bmp_wav_decode import make_bmp
from test_png_pixels import make_png


def field_rgb(w: int, h: int, seed: int = 1) -> bytes:
    """Natural-spectrum test image: random 6x8 coarse grid per channel,
    bilinearly upsampled to (w, h)."""
    rng = np.random.RandomState(seed)
    out = np.zeros((h, w, 3))
    for c in range(3):
        coarse = rng.uniform(0, 255, (6, 8))
        ys = np.linspace(0, 5, h)
        xs = np.linspace(0, 7, w)
        y0 = np.floor(ys).astype(int)
        x0 = np.floor(xs).astype(int)
        y1 = np.minimum(y0 + 1, 5)
        x1 = np.minimum(x0 + 1, 7)
        fy = (ys - y0)[:, None]
        fx = (xs - x0)[None, :]
        out[:, :, c] = (
            coarse[y0][:, x0] * (1 - fy) * (1 - fx)
            + coarse[y1][:, x0] * fy * (1 - fx)
            + coarse[y0][:, x1] * (1 - fy) * fx
            + coarse[y1][:, x1] * fy * fx
        )
    return out.astype(np.uint8).tobytes()


def _noised(rgb: bytes, seed: int = 7, amp: int = 4) -> bytes:
    rng = random.Random(seed)
    return bytes(min(255, max(0, b + rng.randint(-amp, amp))) for b in rgb)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_phash_container_invariant():
    """Same pixels as BMP and as PNG -> IDENTICAL hash (the decode layer
    normalizes containers away)."""
    rgb = field_rgb(40, 30)
    hb = phash64(make_bmp(40, 30, rgb))
    hp = phash64(make_png(40, 30, rgb))
    assert hb is not None and hp is not None
    assert hb[0] == hp[0]
    assert (hb[1], hp[1]) == ("bmp", "png")
    assert (hb[2], hb[3]) == (40, 30)


def test_phash_robust_to_noise_and_resize():
    rgb = field_rgb(64, 48)
    base = phash64(make_bmp(64, 48, rgb))[0]
    noised = phash64(make_bmp(64, 48, _noised(rgb, amp=8)))[0]
    assert _ham(base, noised) <= 4
    arr = np.frombuffer(rgb, np.uint8).reshape(48, 64, 3)
    resized = phash64(make_bmp(32, 24, arr[::2, ::2].tobytes()))[0]
    assert _ham(base, resized) <= 7


def test_phash_separates_distinct_images():
    a = phash64(make_bmp(64, 48, field_rgb(64, 48, seed=1)))[0]
    b = phash64(make_bmp(64, 48, field_rgb(64, 48, seed=9)))[0]
    rng = random.Random(3)
    noise = bytes(rng.randrange(256) for _ in range(64 * 48 * 3))
    c = phash64(make_bmp(64, 48, noise))[0]
    assert _ham(a, b) > 16
    assert _ham(a, c) > 16


def test_phash_rejects_non_images():
    assert phash64(None) is None
    assert phash64(b"not an image at all") is None
    assert phash64(b"\x89PNG\r\n\x1a\n" + b"\x00" * 20) is None


def test_image_phash_near_dup_pipeline(spark):
    """End-to-end: corpus of payloads -> fingerprints (NULL for the junk
    row) -> banded Hamming pairs find exactly the planted near-dup pair
    (a noised PNG re-encode of a BMP original); the plan is equijoin-only
    (no cartesian)."""
    rgb = field_rgb(48, 36)
    rows = [
        (1, make_bmp(48, 36, rgb)),
        (2, make_png(48, 36, _noised(rgb))),
        (3, make_bmp(48, 36, field_rgb(48, 36, seed=5))),
        (4, b"corrupt payload"),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    sigs = image_phash(df)
    got = {r.id: r for r in sigs.collect()}
    assert got[4].phash is None and got[4].format is None
    assert got[2].format == "png" and got[1].format == "bmp"

    pairs = hamming_near_dup(
        sigs, id_col="id", hash_col="phash", bits=64, bands=8, max_hamming=7
    )
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in found
    assert all(p == (1, 2) for p in found), found
