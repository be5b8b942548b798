"""Perceptual-hash robustness sweep: measured recall of the Hamming≤3
pair gate under realistic image perturbations (the pHash analog of
``tools/recall_sweep.py``'s planted-twin methodology).

For N seeded random images, apply each transform, hash original and
twin with the REAL path (encode→decode→``dhash64``/``ahash64``), and
report the Hamming-distance distribution plus recall at the registered
gate (H≤3 — where the quarter-blocked join is pigeonhole-EXACT, so
blocked recall == filter recall).  Deterministic: seeded rng, pure
NumPy transforms — re-running reproduces the table in docs/scale.md::

    python tools/phash_recall.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from petropandas_spark.pipeline import multimodal as mm  # noqa: E402

N = 200
SIZE = 32
GATE = 3


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _imgs(rng):
    # smooth-ish content (random low-res upsampled) + texture: pure
    # white noise has no stable gradients, which would understate
    # every hash's robustness on real photos
    base = rng.integers(0, 256, (N, 8, 8, 3)).repeat(4, 1).repeat(4, 2)
    noise = rng.integers(-12, 13, (N, SIZE, SIZE, 3))
    return np.clip(base + noise, 0, 255).astype(np.float32) / 255.0


def transforms(rng):
    def brightness(img):
        return np.clip(img * 0.9, 0, 1)

    def noise(img):
        d = rng.integers(-2, 3, img.shape) / 255.0
        return np.clip(img + d, 0, 1).astype(np.float32)

    def pixel_edit(img):
        out = img.copy()
        r, c = rng.integers(0, SIZE, 2)
        out[r, c] = 1.0
        return out

    def gamma(img):
        return np.power(img, 0.9, dtype=np.float32)

    def translate1(img):
        return np.roll(img, 1, axis=1)

    def rescale(img):  # 32 -> 16 -> 32 nearest-neighbor round trip
        half = img[::2, ::2]
        return half.repeat(2, 0).repeat(2, 1)

    def jpeg_ish(img):  # 4x4 block-mean quantization, a DCT stand-in
        blocks = img.reshape(SIZE // 4, 4, SIZE // 4, 4, 3)
        means = blocks.mean(axis=(1, 3), keepdims=True)
        return np.clip(0.7 * img.reshape(blocks.shape) + 0.3 * means, 0, 1
                       ).reshape(SIZE, SIZE, 3).astype(np.float32)

    return [("identity_reencode", lambda x: x),
            ("brightness_x0.9", brightness),
            ("noise_pm2", noise),
            ("one_pixel_edit", pixel_edit),
            ("gamma_0.9", gamma),
            ("translate_1px", translate1),
            ("rescale_half_rt", rescale),
            ("blockmean_blend", jpeg_ish)]


def main() -> int:
    rng = np.random.default_rng(7)
    imgs = _imgs(rng)
    hashes = []
    for i in range(N):
        img = mm.decode_image(mm.encode_ppm(imgs[i]))
        hashes.append((mm.dhash64(img), mm.ahash64(img)))
    for name, fn in transforms(rng):
        dh, ah = [], []
        for i in range(N):
            twin = mm.decode_image(mm.encode_ppm(
                fn(imgs[i]).astype(np.float32)))
            dh.append(_ham(hashes[i][0], mm.dhash64(twin)))
            ah.append(_ham(hashes[i][1], mm.ahash64(twin)))
        dh_a, ah_a = np.array(dh), np.array(ah)
        print(json.dumps({
            "transform": name,
            "dhash_mean": round(float(dh_a.mean()), 2),
            "dhash_p95": int(np.percentile(dh_a, 95)),
            "ahash_mean": round(float(ah_a.mean()), 2),
            f"recall_dhash_h{GATE}": round(float((dh_a <= GATE).mean()), 3),
            f"recall_ahash_h{GATE}": round(float((ah_a <= GATE).mean()), 3),
        }))
    # separation: unrelated pairs must stay far outside the gate
    un = np.array([_ham(hashes[i][0], hashes[(i + 1) % N][0])
                   for i in range(N)])
    print(json.dumps({"transform": "UNRELATED_pairs",
                      "dhash_mean": round(float(un.mean()), 2),
                      "dhash_min": int(un.min()),
                      f"fp_rate_h{GATE}": round(float((un <= GATE).mean()),
                                                4)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
