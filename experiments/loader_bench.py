"""Measure the HOST input pipeline behind the device rates (VERDICT r3 weak #3).

The device benches consume 899+ img/s (aux FER train) and ~2,400 face
decodes/s (eval at 297 utt/s x 8 faces); this script measures what the host
side can actually feed:

  * native/faceloader.cpp `decode_resize_batch` (libjpeg + bilinear resize,
    C++ thread pool) at 1/2/4/8 threads, imgs/s;
  * the cv2 per-face fallback loop (the reference's own structure,
    reference utils/dataset.py:47-69), imgs/s;
  * PrefetchLoader overlap: epoch wall time with a mocked device step vs the
    ideal max(host_batch_time, step_time) — how much decode hides behind
    compute with the default 2-deep prefetch.

Run (CPU-only, no TPU needed):
  python experiments/loader_bench.py [n_images] [img_px]
Writes JSON to stdout; numbers go into BASELINE.md's host-pipeline table.

NOTE this dev box has ONE core (CLAUDE.md), so thread scaling here is flat —
the table's value on this box is the single-thread rate; a real TPU-host VM
(usually >= 100 cores) multiplies the thread column.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def make_corpus(root: str, n: int, px: int) -> list:
    import cv2

    rng = np.random.default_rng(0)
    paths = []
    # low-frequency content compresses like real faces (random noise JPEGs
    # are pathologically large and slow to decode)
    base = rng.integers(0, 255, (px // 8, px // 8, 3), np.uint8)
    for i in range(n):
        img = cv2.resize(base, (px, px), interpolation=cv2.INTER_CUBIC)
        img = np.clip(img.astype(np.int16)
                      + rng.integers(-20, 20, (px, px, 3)), 0, 255
                      ).astype(np.uint8)
        p = os.path.join(root, f"face_{i:05d}.jpg")
        cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 90])
        paths.append(p)
    return paths


def bench_native(paths, target, threads, repeats=3):
    from facialmmt_tpu import native

    if native.load_library() is None:
        return None
    out = np.zeros((len(paths), target, target, 3), np.uint8)
    native.decode_resize_batch(paths, target, out, num_threads=threads)  # warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        native.decode_resize_batch(paths, target, out, num_threads=threads)
        best = min(best, time.perf_counter() - t0)
    return len(paths) / best


def bench_cv2(paths, target, repeats=2):
    import cv2

    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for p in paths:
            im = cv2.imread(p)
            cv2.resize(im, (target, target), interpolation=cv2.INTER_AREA)
        best = min(best, time.perf_counter() - t0)
    return len(paths) / best


def bench_prefetch_overlap(paths, target, batch=64, step_ms=50.0):
    """Epoch wall time with a mocked device step: ideally decode hides fully
    behind the step and wall ~= n_batches * step_time."""
    from facialmmt_tpu import native
    from facialmmt_tpu.data.loader import PrefetchLoader

    use_native = native.load_library() is not None

    def make_batch(indices):
        sel = [paths[i] for i in indices]
        if use_native:
            return native.decode_resize_batch(sel, target)
        import cv2

        return np.stack([cv2.resize(cv2.imread(p), (target, target))
                         for p in sel])

    loader = PrefetchLoader(make_batch, len(paths), batch, shuffle=False)
    n_batches = len(loader)
    t0 = time.perf_counter()
    for _batch, _n in loader.epoch(0):
        time.sleep(step_ms / 1000.0)  # mocked device step
    wall = time.perf_counter() - t0
    # serial host time for the same work
    t0 = time.perf_counter()
    for start in range(0, len(paths), batch):
        make_batch(range(start, min(start + batch, len(paths))))
    host = time.perf_counter() - t0
    ideal = max(host, n_batches * step_ms / 1000.0)
    return {"wall_s": wall, "host_only_s": host,
            "step_only_s": n_batches * step_ms / 1000.0,
            "ideal_s": ideal, "overlap_efficiency": ideal / wall}


def main(n=2048, px=160, target=224):
    res = {"n_images": n, "src_px": px, "target_px": target,
           "nproc": os.cpu_count()}
    with tempfile.TemporaryDirectory() as root:
        t0 = time.perf_counter()
        paths = make_corpus(root, n, px)
        res["corpus_write_s"] = round(time.perf_counter() - t0, 2)
        res["jpeg_kb_mean"] = round(
            np.mean([os.path.getsize(p) for p in paths]) / 1024, 1)
        for threads in (1, 2, 4, 8):
            r = bench_native(paths, target, threads)
            res[f"native_{threads}t_imgs_per_s"] = (
                round(r, 1) if r else None)
        res["cv2_loop_imgs_per_s"] = round(bench_cv2(paths, target), 1)
        res["prefetch"] = {k: round(v, 3) for k, v in
                           bench_prefetch_overlap(paths, target).items()}
    print(json.dumps(res))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2048,
         int(sys.argv[2]) if len(sys.argv) > 2 else 160)
