"""Audio-fingerprint robustness sweep: measured recall of the
Hamming≤3 pair gate under realistic audio perturbations — the audio
twin of ``tools/phash_recall.py`` (r12 verdict item 4: the image tier
had a planted-transform recall table, the audio tier had none).

For N seeded random clips, apply each transform, fingerprint original
and twin through the REAL path (``encode_wav`` → ``decode_audio`` →
``audio_fingerprint64`` — the 16-bit PCM round-trip included), and
report the Hamming-distance distribution plus recall at the registered
gate (H≤3 — where the quarter-blocked join is pigeonhole-EXACT, so
blocked recall == filter recall).  Deterministic: seeded rng, pure
NumPy transforms — re-running reproduces the table in docs/scale.md::

    python tools/audio_recall.py
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
LEN = 2080  # 65 frames × 32 samples at the fingerprint's framing
RATE = 8000
GATE = 3


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _clips(rng):
    """Speech/music-ish content: a sinusoid carrier under a PER-CLIP
    random frame-scale amplitude profile (a smoothed random walk
    interpolated across the 65 fingerprint frames) + mild noise.  The
    profile is what the fingerprint reads — each clip's energy-sign
    pattern is an i.i.d.-ish 64-bit signature, so the unrelated-pair
    floor is meaningful (a slowly-varying global envelope would give
    every clip the SAME sign profile and a degenerate floor — the audio
    analog of gradient-free images in ``phash_recall``)."""
    t = np.arange(LEN) / RATE
    clips = np.empty((N, LEN), dtype=np.float32)
    for i in range(N):
        prof = rng.uniform(0.1, 0.9, 66)
        amp = np.interp(np.linspace(0.0, 65.0, LEN), np.arange(66.0),
                        prof)
        f0 = rng.uniform(200, 1000)
        sig = amp * np.sin(2 * np.pi * f0 * t
                           + rng.uniform(0, 2 * np.pi))
        sig = sig + rng.normal(0, 0.004, LEN)
        clips[i] = np.clip(sig, -0.999, 0.999).astype(np.float32)
    return clips


def _fp(samples: np.ndarray) -> int:
    """The REAL path: float samples → 16-bit PCM WAV bytes → decode →
    fingerprint (not the in-memory shortcut).  ``encode_wav`` takes
    float in [-1, 1] and owns the 16-bit quantization."""
    back, _rate = mm.decode_audio(mm.encode_wav(samples, RATE))
    return mm.audio_fingerprint64(back)


def transforms(rng):
    def gain_down(s):
        return s * 0.9

    def gain_up(s):
        return np.clip(s * 1.1, -0.999, 0.999)

    def dc_offset(s):
        return np.clip(s + 0.01, -0.999, 0.999)

    def noise_mild(s):
        return np.clip(s + rng.normal(0, 2 / 32768.0, s.shape), -1, 1)

    def resample_half(s):  # integer-factor decimation (8k -> 4k)
        return s[::2]

    def resample_double(s):  # zero-order-hold upsample (8k -> 16k)
        return s.repeat(2)

    def trim_head(s):  # drop 16 samples (~2 ms) — shifts every frame
        return s[16:]

    def requantize_8bit(s):  # 8-bit round trip (lossy telephone-ish)
        return np.rint(s * 127) / 127.0

    return [("identity_reencode", lambda x: x),
            ("gain_x0.9", gain_down),
            ("gain_x1.1", gain_up),
            ("dc_offset_+1pct", dc_offset),
            ("noise_pm2lsb", noise_mild),
            ("resample_half", resample_half),
            ("resample_double", resample_double),
            ("trim_16_samples", trim_head),
            ("requantize_8bit", requantize_8bit)]


def main() -> int:
    rng = np.random.default_rng(11)
    clips = _clips(rng)
    base = [_fp(clips[i]) for i in range(N)]
    for name, fn in transforms(rng):
        hs = np.array([_ham(base[i], _fp(fn(clips[i]).astype(np.float32)))
                       for i in range(N)])
        print(json.dumps({
            "transform": name,
            "mean": round(float(hs.mean()), 2),
            "p95": int(np.percentile(hs, 95)),
            f"recall_h{GATE}": round(float((hs <= GATE).mean()), 3),
        }))
    un = np.array([_ham(base[i], base[(i + 1) % N]) for i in range(N)])
    print(json.dumps({"transform": "UNRELATED_pairs",
                      "mean": round(float(un.mean()), 2),
                      "min": int(un.min()),
                      f"fp_rate_h{GATE}": round(float((un <= GATE).mean()),
                                                4)}))

    # -- multi-offset union gate (the time-offset mitigation) ------------
    # store fingerprints at framing offsets {0, ½ frame}; a pair fires
    # if ANY offset combination is within the gate (exactly what
    # audio_neardup_pairs_multioffset computes over stacked rows).
    for offs, tag in (((0.0, 0.5), "MULTIOFFSET2"),
                      ((0.0, 0.25, 0.5, 0.75), "MULTIOFFSET4")):
        def _mfp(s):
            back, _r = mm.decode_audio(mm.encode_wav(s, RATE))
            return [mm.audio_fingerprint64(back, o) for o in offs]

        def _mham(fa, fb):
            return min(_ham(a, b) for a in fa for b in fb)

        mbase = [_mfp(clips[i]) for i in range(N)]
        for k in (8, 16, 24):
            hs = np.array([
                _mham(mbase[i], _mfp(clips[i][k:].astype(np.float32)))
                for i in range(N)])
            print(json.dumps({
                "transform": f"trim_{k}_samples_{tag}",
                "mean": round(float(hs.mean()), 2),
                "p95": int(np.percentile(hs, 95)),
                f"recall_h{GATE}": round(float((hs <= GATE).mean()), 3),
            }))
        mun = np.array([_mham(mbase[i], mbase[(i + 1) % N])
                        for i in range(N)])
        print(json.dumps({"transform": f"UNRELATED_pairs_{tag}",
                          "mean": round(float(mun.mean()), 2),
                          "min": int(mun.min()),
                          f"fp_rate_h{GATE}":
                          round(float((mun <= GATE).mean()), 4)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
