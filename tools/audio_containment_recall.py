"""Audio CONTAINMENT robustness sweep: measured recall of the
clip-from-longer-track gate as a function of WHERE the clip was cut —
the containment analog of ``tools/audio_recall.py`` (which measured
the symmetric whole-clip gate's time-offset failure).

The windowed substrate (``audio_fingerprints_windows``) places window
starts at multiples of W from CLIP START, so a clip cut ``delta``
samples past a window boundary has every window straddling two of the
track's windows — the hypothesis is that containment recall collapses
for any non-trivial ``delta``, exactly like the half-frame trim killed
the whole-clip fingerprint.  The onset-anchored substrate
(``audio_fingerprints_onsets``) locks window starts to CONTENT
(energy-attack transients), so interior onsets survive the cut with
sample-identical windows — the audio twin of the shot-anchor fix.

For N seeded tracks (segments with attack transients at the head —
speech/music-ish onset structure), cut a clip at each alignment class,
fingerprint track and clip through the REAL path (``encode_wav`` →
``decode_audio``), and report containment-gate recall (fraction of
(track, clip) pairs where ≥ ``MIN_FRAC`` of the clip's signatures
match one of the track's within H≤3) plus the unrelated-pair false-
positive count.  Deterministic; re-running reproduces the table in
``docs/scale.md``::

    python tools/audio_containment_recall.py
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
W = 1040           # window_samples (the registered gate's default)
FR = 16            # fingerprint framing granularity (fixture convention)
DFR = 64           # onset DETECTOR frame (library default: coarse frames
                   # keep chi-square noise fluctuations below the ratio
                   # test, so only real attacks fire)
SEGS = 8           # track length = SEGS × W
CLIP_W = 4         # clip length = CLIP_W × W
RATE = 8000
GATE = 3           # Hamming gate per signature
MIN_FRAC = 0.7     # registered containment threshold
MIN_RATIO = 4.0    # onset detector (library defaults)
MIN_ENERGY = 1_000_000


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _tracks(rng):
    """SEGS×W-sample tracks: each W-segment opens with a loud 2-frame
    attack then sustains a per-segment random amplitude profile — the
    attack transients are the content-locked onsets a real recording's
    note/word boundaries provide.  Per-track random profiles keep the
    unrelated floor meaningful (the r13 fixture lesson)."""
    tracks = np.empty((N, SEGS * W), dtype=np.int64)
    for i in range(N):
        t = np.empty(SEGS * W, dtype=np.float64)
        for s in range(SEGS):
            base = rng.uniform(300, 900)
            prof = rng.uniform(0.5, 1.5, W // FR)
            seg = (rng.standard_normal(W)
                   * np.repeat(prof, FR) * base)
            seg[: 2 * FR] *= rng.uniform(8.0, 12.0)  # the attack
            t[s * W:(s + 1) * W] = seg
        tracks[i] = np.clip(np.rint(t), -30000, 30000).astype(np.int64)
    return tracks


def _roundtrip(v: np.ndarray) -> np.ndarray:
    """encode→decode through the real WAV path; returns float samples
    whose rint(x·32768) restores the integers."""
    blob = mm.encode_wav(v.astype(np.float32) / 32767.0, RATE)
    x, _ = mm.decode_audio(blob)
    return x


def _window_sigs(x: np.ndarray) -> list[int]:
    return [mm.audio_fingerprint64(x[k * W:(k + 1) * W])
            for k in range(len(x) // W)]


def _onset_sigs(x: np.ndarray, refined: bool = True) -> list[int]:
    """Mirror of audio_fingerprints_onsets' anchor logic.
    ``refined=False`` keeps the frame-quantized variant for the
    ablation row (the failure the sample-exact refinement fixes)."""
    s = np.rint(x * 32768.0).astype(np.int64)
    n = len(s) - len(s) % DFR
    e = (s[:n].reshape(-1, DFR) ** 2).sum(axis=1)
    hits = [f for f in range(1, len(e))
            if e[f] > MIN_RATIO * e[f - 1] and e[f] > MIN_ENERGY]
    if refined:
        pos = []
        for f in hits:
            lo, hi = max(0, (f - 1) * DFR), min(len(s), (f + 2) * DFR)
            p0 = lo + int(np.abs(s[lo:hi]).argmax())
            lo2, hi2 = max(0, p0 - DFR), min(len(s), p0 + DFR)
            pos.append(lo2 + int(np.abs(s[lo2:hi2]).argmax()))
        pos = sorted(set(pos)) or [max(0, (len(s) - W) // 2)]
    else:
        pos = [f * DFR for f in hits] or [max(0, (len(s) - W) // 2)]
    pos = [p for p in pos if p + W <= len(s)] \
        or [max(0, (len(s) - W) // 2)]
    return [mm.audio_fingerprint64(x[p:p + W]) for p in pos]


def _containment(clip_sigs: list[int], track_sigs: list[int]) -> float:
    if not clip_sigs:
        return 0.0
    matched = sum(1 for c in set(clip_sigs)
                  if any(_ham(c, t) <= GATE for t in set(track_sigs)))
    return matched / len(set(clip_sigs))


def main() -> int:
    rng = np.random.default_rng(73)
    tracks = _tracks(rng)
    track_rt = [_roundtrip(t) for t in tracks]
    wsigs = [_window_sigs(x) for x in track_rt]
    osigs = [_onset_sigs(x) for x in track_rt]
    oq = [_onset_sigs(x, refined=False) for x in track_rt]

    cuts = {
        "aligned (delta=0)": 0,
        "eighth-window (delta=W/8)": W // 8,
        "quarter-window (delta=W/4)": W // 4,
        "half-window (delta=W/2)": W // 2,
        "arbitrary (delta=137)": 137,
    }
    for label, delta in cuts.items():
        rec_w = rec_o = rec_q = 0
        for i in range(N):
            c0 = W + delta          # cut inside the track, past seg 0
            clip = _roundtrip(tracks[i][c0:c0 + CLIP_W * W])
            cw = _containment(_window_sigs(clip), wsigs[i])
            co = _containment(_onset_sigs(clip), osigs[i])
            cq = _containment(_onset_sigs(clip, refined=False), oq[i])
            rec_w += cw >= MIN_FRAC
            rec_o += co >= MIN_FRAC
            rec_q += cq >= MIN_FRAC
        print(json.dumps({
            "cut": label,
            "recall_windows": round(rec_w / N, 3),
            "recall_onsets_frame_quantized": round(rec_q / N, 3),
            "recall_onsets_refined": round(rec_o / N, 3),
        }))

    # unrelated floor: clips vs OTHER tracks must not fire
    fp_w = fp_o = 0
    pairs = 0
    for i in range(0, N, 4):
        clip = _roundtrip(tracks[i][W:W + CLIP_W * W])
        csw, cso = _window_sigs(clip), _onset_sigs(clip)
        for j in range(N):
            if j == i:
                continue
            pairs += 1
            fp_w += _containment(csw, wsigs[j]) >= MIN_FRAC
            fp_o += _containment(cso, osigs[j]) >= MIN_FRAC
    print(json.dumps({"unrelated_pairs": pairs,
                      "fp_windows": fp_w, "fp_onsets": fp_o}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
