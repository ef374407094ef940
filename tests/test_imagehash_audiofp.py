"""Perceptual image hashing (aHash/dHash/pHash + Hamming banding) and
audio landmark fingerprinting (Wang 2003 constellation scheme)."""

import numpy as np
import pytest

from intake_spark.llm.audiofp import landmark_match_pairs, landmarks
from intake_spark.llm.imagehash import (
    _block_mean,
    ahash64,
    dhash64,
    hamming_band_pairs,
    image_hashes,
    phash64,
    phash_pairs,
)


def _img(h, w, seed=0, hi=101):
    return np.random.default_rng(seed).integers(0, hi, (h, w), dtype=np.uint8)


# --- hash primitives -------------------------------------------------------


def test_block_mean_exact_small_case():
    a = np.array([[1, 2, 3, 4], [5, 6, 7, 8]], dtype=np.float64)
    out = _block_mean(a, 1, 2)
    np.testing.assert_allclose(out, [[3.5, 5.5]])
    # non-divisible split is deterministic (array_split semantics)
    out = _block_mean(a, 2, 3)
    np.testing.assert_allclose(out, [[1.5, 3.0, 4.0], [5.5, 7.0, 8.0]])


def test_phash_dhash_affine_invariant_ahash_scale_invariant():
    """pHash/dHash bits are EXACTLY invariant under positive affine
    pixel remaps a*px + b (the dedup property the q132 oracle builds
    on); aHash under pure scaling."""
    for seed in range(8):
        img = _img(37, 41, seed)
        twin = (2 * img.astype(np.int64) + 10).astype(np.uint8)
        assert phash64(img) == phash64(twin)
        assert dhash64(img) == dhash64(twin)
        assert ahash64(img) == ahash64((2 * img.astype(np.int64)).astype(np.uint8))


def test_phash_separates_distinct_images():
    hs = [phash64(_img(32, 32, s)) for s in range(12)]
    for i in range(len(hs)):
        for j in range(i + 1, len(hs)):
            assert bin(hs[i] ^ hs[j]).count("1") > 10


def test_hashes_fit_nonnegative_int64():
    img = _img(16, 16, 3, hi=256)
    for f in (phash64, ahash64, dhash64):
        h = f(img)
        assert 0 <= h < 2**63


def test_phash_channel_and_size_normalization():
    """3-channel and resized renditions hash close to the original —
    the cross-encoding robustness pHash exists for."""
    img = _img(64, 64, 5, hi=256)
    rgb = np.stack([img, img, img], axis=-1)
    assert phash64(rgb) == phash64(img)
    half = _block_mean(img, 32, 32)  # exact 2x downscale
    d = bin(phash64(img) ^ phash64(half)).count("1")
    assert d <= 4


# --- banded pair generation ------------------------------------------------


def test_hamming_band_pairs_recall_and_threshold(spark):
    """Pigeonhole recall is exact for max_hamming < bands; pairs past
    the threshold are excluded; bit-63-set hashes band correctly
    (shiftrightunsigned, not arithmetic shift)."""
    base = (1 << 63) | 0x123456789ABCDEF0  # negative as signed int64
    h2 = base ^ 0b101  # hamming 2
    far = base ^ ((1 << 5) | (1 << 21) | (1 << 37) | (1 << 53))  # 4 bits,
    # one per 16-bit band: agrees on NO band -> pigeonhole excludes it
    rows = [(1, base), (2, h2), (3, far)]
    sig = spark.createDataFrame(
        [(i, int(np.uint64(h).astype(np.int64))) for i, h in rows],
        "id bigint, hash bigint",
    )
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in hamming_band_pairs(
            sig, id_col="id", bands=4, max_hamming=3
        ).collect()
    }
    assert got == {(1, 2): 2}

    with pytest.raises(ValueError, match="pigeonhole"):
        hamming_band_pairs(sig, id_col="id", bands=4, max_hamming=4)
    with pytest.raises(ValueError, match="divide"):
        hamming_band_pairs(sig, id_col="id", bands=5)


def test_image_hashes_err_rows_and_phash_pairs(spark):
    from intake_spark.output import _png_bytes

    img = _img(32, 32, 9)
    twin = (2 * img.astype(np.int64) + 10).astype(np.uint8)
    other = _img(32, 32, 10)
    rows = [
        (1, bytearray(_png_bytes(img.tolist()))),
        (2, bytearray(_png_bytes(twin.tolist()))),
        (3, bytearray(_png_bytes(other.tolist()))),
        (4, bytearray(b"\x89PNG\r\n\x1a\ngarbage")),
    ]
    df = spark.createDataFrame(rows, "image_id bigint, image binary")
    hashes = image_hashes(df, algos=("phash", "ahash", "dhash")).collect()
    errs = [r for r in hashes if r.err is not None]
    assert {r.image_id for r in errs} == {4} and len(errs) == 3
    assert all(r.hash is not None for r in hashes if r.image_id != 4)

    pairs = phash_pairs(df).collect()
    assert {(r.id_a, r.id_b, r.hamming) for r in pairs} == {(1, 2, 0)}


# --- audio landmarks ---------------------------------------------------------


def _tone(freq_bins, amps, n=4096):
    t = np.arange(n)
    x = sum(a * np.sin(2 * np.pi * k * t / 256.0)
            for k, a in zip(freq_bins, amps))
    return np.round(x).astype(np.int16)


def test_landmarks_gain_invariant_and_selective():
    pcm = _tone([10, 45, 80, 110], [9000, 7000, 5000, 3000])
    lm = landmarks(pcm)
    assert lm and lm == landmarks(pcm // 2)
    other = _tone([20, 55, 70, 120], [9000, 7000, 5000, 3000])
    assert not (lm & landmarks(other))
    # stereo collapses by channel mean; short/empty input yields none
    assert landmarks(np.stack([pcm, pcm], axis=1)) == lm
    assert landmarks(pcm[:100]) == set()


def test_landmark_hash_fields():
    """landmark = f1 << 20 | f2 << 8 | dt with rFFT bin numbers — both
    peaks recoverable, dt within fanout."""
    lm = landmarks(_tone([10, 45, 80, 110], [9000, 7000, 5000, 3000]))
    for h in lm:
        f1, f2, dt = h >> 20, (h >> 8) & 0xFFF, h & 0xFF
        assert 1 <= f1 <= 128 and 1 <= f2 <= 128 and 1 <= dt <= 3
        assert {f1, f2} <= {10, 45, 80, 110}


def test_landmark_match_pairs_math_and_hot_cap(spark):
    # recording 1: landmarks {a,b,c,d}; 2: {a,b,c,e}; 3: {f,g}
    rows = [(1, h) for h in (10, 11, 12, 13)] + \
           [(2, h) for h in (10, 11, 12, 14)] + \
           [(3, h) for h in (20, 21)]
    lm = spark.createDataFrame(
        [(i, h, None) for i, h in rows],
        "audio_id bigint, landmark bigint, err string",
    )
    got = landmark_match_pairs(lm, min_containment_pm=700).collect()
    assert [(r.id_a, r.id_b, r.n_common, r.containment_pm)
            for r in got] == [(1, 2, 3, 750)]
    # hot-landmark cap: a landmark in every recording is dropped before
    # the join, numerators shrink, denominators stay full
    rows_hot = rows + [(1, 99), (2, 99), (3, 99)]
    lm_hot = spark.createDataFrame(
        [(i, h, None) for i, h in rows_hot],
        "audio_id bigint, landmark bigint, err string",
    )
    got = landmark_match_pairs(
        lm_hot, min_containment_pm=500, max_landmark_df=2
    ).collect()
    assert [(r.id_a, r.id_b, r.n_common, r.containment_pm)
            for r in got] == [(1, 2, 3, 600)]


def test_hashes_handle_tiny_images():
    """Inputs smaller than the hash grid nearest-upsample first — no
    NaN bits, still deterministic, still affine-invariant."""
    import warnings

    for shape in [(1, 1), (3, 5), (10, 10), (7, 40)]:
        img = _img(*shape, seed=shape[0] * 100 + shape[1], hi=101)
        twin = (2 * img.astype(np.int64) + 10).astype(np.uint8)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            for f in (phash64, ahash64, dhash64):
                h = f(img)
                assert 0 <= h < 2**63
            assert phash64(img) == phash64(twin)
            assert dhash64(img) == dhash64(twin)


def test_media_dedup_plan_shapes(spark):
    """Plan audit for the media-dedup operators: equi-joins only (no
    cartesian/broadcast-nested-loop), and the pair-stage shuffle
    carries signatures, never media bytes."""
    from intake_spark.llm.audiofp import (
        audio_landmarks,
        landmark_match_pairs,
    )

    img = spark.createDataFrame(
        [(1, bytearray(b"\x89PNG")), (2, bytearray(b"\x89PNG"))],
        "image_id bigint, image binary",
    )
    plan = phash_pairs(img)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the join stage keys on the band columns
    assert "band_id" in plan and "band_val" in plan

    au = spark.createDataFrame(
        [(1, bytearray(b"RIFF")), (2, bytearray(b"RIFF"))],
        "audio_id bigint, audio binary",
    )
    pairs = landmark_match_pairs(audio_landmarks(au))
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "landmark" in plan


def test_hamming_band_pairs_rejects_full_width_band(spark):
    sig = spark.createDataFrame([(1, 5)], "id bigint, hash bigint")
    with pytest.raises(ValueError, match="narrower than 64"):
        hamming_band_pairs(sig, id_col="id", bands=1, max_hamming=0)


def test_dhash_uses_all_63_bits():
    """8x9 grid -> 64 comparisons truncated to 63: the top band must be
    informative (the old 7x9 grid left bits 56-62 always zero, starving
    band 3 of entropy)."""
    import numpy as np

    rng = np.random.default_rng(7)
    seen_high = 0
    for _ in range(24):
        img = rng.integers(0, 256, size=(40, 40), dtype=np.uint8)
        h = dhash64(img)
        seen_high |= h >> 56
    assert seen_high != 0  # some bit above 55 fires across random images


def test_landmark_geometry_guards():
    import numpy as np
    import pytest

    from intake_spark.llm.audiofp import landmarks

    x = np.zeros(20000)
    with pytest.raises(ValueError, match="12 bits"):
        landmarks(x, frame=16384)
    with pytest.raises(ValueError, match="dt field"):
        landmarks(x, fanout=256)
    # boundary geometries are fine
    landmarks(x[:9000], frame=8190, hop=4096)
