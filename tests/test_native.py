"""Native C++ face loader tests: decode parity vs cv2, resize quality,
thread-pool throughput, graceful degradation."""

import os
import time

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from facialmmt_tpu.native import decode_resize_batch, load_library

pytestmark = pytest.mark.skipif(load_library() is None,
                                reason="native toolchain/libjpeg unavailable")


def write_jpegs(tmp_path, rng, n=6, size=160, quality=95):
    paths = []
    for i in range(n):
        img = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        # smooth it so jpeg is near-lossless at q95
        img = cv2.GaussianBlur(img, (7, 7), 3)
        p = str(tmp_path / f"f{i}.jpg")
        cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, quality])
        paths.append(p)
    return paths


def test_decode_matches_cv2(tmp_path, rng):
    paths = write_jpegs(tmp_path, rng, size=160)
    out = decode_resize_batch(paths, 160)
    assert out is not None
    for i, p in enumerate(paths):
        want = cv2.imread(p)  # BGR
        diff = np.abs(out[i].astype(int) - want.astype(int))
        # same libjpeg => identical pixels (allow <=1 LSB for IDCT variants)
        assert diff.max() <= 1, diff.max()


def test_upscale_close_to_cv2_cubic(tmp_path, rng):
    paths = write_jpegs(tmp_path, rng, size=160)
    out = decode_resize_batch(paths, 224)
    for i, p in enumerate(paths):
        want = cv2.resize(cv2.imread(p), (224, 224),
                          interpolation=cv2.INTER_CUBIC)
        mad = np.abs(out[i].astype(float) - want.astype(float)).mean()
        assert mad < 1.5, mad  # same kernel family, rounding differences only


def test_downscale_close_to_cv2_area(tmp_path, rng):
    paths = write_jpegs(tmp_path, rng, size=160)
    out = decode_resize_batch(paths, 112)
    for i, p in enumerate(paths):
        want = cv2.resize(cv2.imread(p), (112, 112),
                          interpolation=cv2.INTER_AREA)
        mad = np.abs(out[i].astype(float) - want.astype(float)).mean()
        assert mad < 1.5, mad


def test_missing_and_none_paths_zeroed(tmp_path, rng):
    paths = write_jpegs(tmp_path, rng, n=2)
    out = decode_resize_batch([paths[0], "/nonexistent.jpg", None, paths[1]],
                              64)
    assert out[0].sum() > 0 and out[3].sum() > 0
    assert out[1].sum() == 0 and out[2].sum() == 0


def test_thread_pool_faster_than_serial(tmp_path, rng):
    paths = write_jpegs(tmp_path, rng, n=64, size=160)
    # warm page cache
    decode_resize_batch(paths, 224, num_threads=1)

    def best_of(n_threads, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            decode_resize_batch(paths, 224, num_threads=n_threads)
            best = min(best, time.perf_counter() - t0)
        return best

    serial = best_of(1)
    pooled = best_of(8)
    # under CI load absolute speedups vary; require "not slower" with margin
    assert pooled < serial * 1.2, (pooled, serial)
