"""Video near-dup robustness sweep: measured recall of the
"≥ min_shared shared frame hashes" gate under realistic video edits,
comparing the FIXED-COUNT temporal sampler (``video_fingerprints``)
against the SHOT-ANCHORED fingerprints (``video_fingerprints_shots``)
— the video twin of ``tools/audio_recall.py``'s time-offset story.

For N seeded videos (3 shots × 8 frames, smooth per-shot content with
per-frame jitter), apply each edit, fingerprint original and twin
through the REAL path (``encode_ppm_video`` → ``decode_video_frames``
→ hash), and report recall at the registered gate (a pair fires iff
the two hash SETS share ≥ 2 values — exactly what
``video_neardup_pairs(min_shared=2)`` computes).  Deterministic::

    python tools/video_recall.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from petropandas_spark.pipeline import multimodal as mm  # noqa: E402

N = 120
SIZE = 16
SHOTS = 3
SHOT_LEN = 8
MIN_SHARED = 2
MIN_CUT = 1_000_000


def _videos(rng):
    """N videos, each 3 shots of 8 frames: per-shot smooth base image
    (low-res upsampled), per-frame ±2-level jitter — within a shot the
    dHash is stable, across a cut it changes completely."""
    vids = []
    for _ in range(N):
        frames = []
        for _s in range(SHOTS):
            # static per-shot texture (±12) bakes stable gradients into
            # the shot — without it the blocky upsampled base leaves
            # tied dHash comparisons whose bits coin-flip under the
            # per-frame jitter (the same note phash_recall makes about
            # gradient-free content)
            base = (rng.integers(0, 256, (4, 4, 3)).repeat(4, 0)
                    .repeat(4, 1)
                    + rng.integers(-12, 13, (SIZE, SIZE, 3)))
            for _f in range(SHOT_LEN):
                jit = rng.integers(-2, 3, (SIZE, SIZE, 3))
                frames.append(
                    np.clip(base + jit, 0, 255).astype(np.float32) / 255.0)
        vids.append(frames)
    return vids


def _sampled_hashes(frames):
    """The fixed-count sampler's hash set (temporal NN, 4 picks) through
    the real container round-trip."""
    back = mm.decode_video_frames(mm.encode_ppm_video(frames))
    nf = len(back)
    picks = [min(int((k + 0.5) * nf / 4), nf - 1) for k in range(4)]
    return {mm.dhash64(back[p]) for p in picks}


def _shot_hashes(frames):
    """The shot-anchored hash set (same logic as
    ``video_fingerprints_shots``) through the real round-trip."""
    back = mm.decode_video_frames(mm.encode_ppm_video(frames))
    grids = [mm.luma_grid(f, 8, 8) for f in back]
    anchors = [i for i in range(1, len(grids))
               if int(np.abs(grids[i] - grids[i - 1]).sum()) > MIN_CUT]
    anchors = anchors or [len(back) // 2]
    return {mm.dhash64(back[a]) for a in anchors}


def edits(rng):
    def head_trim_1(fr):
        return fr[1:]

    def head_trim_3(fr):
        return fr[3:]

    def tail_trim_2(fr):
        return fr[:-2]

    def both_trim(fr):
        return fr[2:-2]

    def brightness(fr):
        return [np.clip(f * 0.9, 0, 1).astype(np.float32) for f in fr]

    def noise(fr):
        return [np.clip(f + rng.integers(-2, 3, f.shape) / 255.0,
                        0, 1).astype(np.float32) for f in fr]

    def prepend_title(fr):
        # a 4-frame uniform title card prepended (the degenerate-hash
        # class the stop-hash cap exists for)
        card = [np.full((SIZE, SIZE, 3), 0.1, dtype=np.float32)] * 4
        return card + fr

    return [("identity_reencode", lambda x: list(x)),
            ("head_trim_1", head_trim_1),
            ("head_trim_3", head_trim_3),
            ("tail_trim_2", tail_trim_2),
            ("both_trim_2+2", both_trim),
            ("brightness_x0.9", brightness),
            ("noise_pm2", noise),
            ("prepend_4f_title", prepend_title)]


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _fuzzy_shared(ha: set, hb: set, gate: int = 3) -> int:
    """The ``video_neardup_pairs_fuzzy`` count: least(distinct a-side
    hashes with a match in b, distinct b-side hashes with a match in
    a) at Hamming ≤ gate."""
    na = sum(1 for a in ha if any(_ham(a, b) <= gate for b in hb))
    nb = sum(1 for b in hb if any(_ham(a, b) <= gate for a in ha))
    return min(na, nb)


def main() -> int:
    rng = np.random.default_rng(13)
    vids = _videos(rng)
    base_s = [_sampled_hashes(v) for v in vids]
    base_a = [_shot_hashes(v) for v in vids]
    for name, fn in edits(rng):
        rs, ra, fs, fa = [], [], [], []
        for i in range(N):
            twin = fn(vids[i])
            ts, ta = _sampled_hashes(twin), _shot_hashes(twin)
            rs.append(len(base_s[i] & ts) >= MIN_SHARED)
            ra.append(len(base_a[i] & ta) >= MIN_SHARED)
            fs.append(_fuzzy_shared(base_s[i], ts) >= MIN_SHARED)
            fa.append(_fuzzy_shared(base_a[i], ta) >= MIN_SHARED)
        union = [a or b for a, b in zip(fs, fa)]
        print(json.dumps({
            "edit": name,
            "recall_sampled": round(float(np.mean(rs)), 3),
            "recall_shot_anchored": round(float(np.mean(ra)), 3),
            "recall_sampled_fuzzy": round(float(np.mean(fs)), 3),
            "recall_shot_fuzzy": round(float(np.mean(fa)), 3),
            "recall_UNION_fuzzy": round(float(np.mean(union)), 3),
        }))
    # unrelated-pair floor for every mode
    fp_s = [len(base_s[i] & base_s[(i + 1) % N]) >= MIN_SHARED
            for i in range(N)]
    fp_a = [len(base_a[i] & base_a[(i + 1) % N]) >= MIN_SHARED
            for i in range(N)]
    fp_fs = [_fuzzy_shared(base_s[i], base_s[(i + 1) % N]) >= MIN_SHARED
             for i in range(N)]
    fp_fa = [_fuzzy_shared(base_a[i], base_a[(i + 1) % N]) >= MIN_SHARED
             for i in range(N)]
    print(json.dumps({"edit": "UNRELATED_pairs",
                      "fp_sampled": round(float(np.mean(fp_s)), 4),
                      "fp_shot_anchored": round(float(np.mean(fp_a)), 4),
                      "fp_sampled_fuzzy": round(float(np.mean(fp_fs)), 4),
                      "fp_shot_fuzzy": round(float(np.mean(fp_fa)), 4)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
