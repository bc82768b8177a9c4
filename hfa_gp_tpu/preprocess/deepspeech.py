"""DeepSpeech audio feature extraction — `aud.npy` from a 16 kHz wav.

The reference consumes DeepSpeech features extracted by AD-NeRF's
tooling (reference README.md:41; `code/dataset.py:404` loads `aud.npy`
of shape (n_video_frames, 16, 29)). That tooling runs the Mozilla
DeepSpeech 0.1.0 TensorFlow graph over MFCC windows; this module
re-implements the whole chain natively:

  wav (16 kHz mono) ──mfcc──► (T, 26) @ 50 Hz ──context──► (T, 494)
      ──DS-0.1.0 net──► logits (T, 29) ──resample──► (N, 29) @ fps
      ──16-frame window──► aud.npy (N, 16, 29)

Feature math matches DeepSpeech 0.1.0's `audiofile_to_input_vector`
(python_speech_features defaults): preemphasis 0.97, 25 ms rectangular
frames at 10 ms hop, 512-pt power spectrum, 26 mel filters to Nyquist,
DCT-II(ortho) keeping 26 coeffs, ceplifter 22, log-energy as c0, then
every SECOND frame (→ 50 Hz), ±9-frame context stacking with zero
edges, and whole-utterance (x-mean)/std normalization.

The network is DS 0.1.0's: three 2048-wide clipped-ReLU
(min(relu,20)) dense layers, one bidirectional BasicLSTMCell(2048)
(TF gate order i,j,f,o with forget_bias 1.0), concat(fw,bw) → one more
clipped-ReLU dense, then a 29-way logit head. Weights convert from the
public `deepspeech-0.1.0-models` checkpoint via
tools/convert_deepspeech.py; random init keeps the pipeline testable
in-env (same caveat as LPIPS/MTCNN: golden parity needs the real
checkpoint, absent here).

Logits are linearly resampled from 50 Hz to the video fps and packed
into zero-padded 16-frame windows per video frame (AD-NeRF's
`interpolate_features` + sliding-window convention, consumed at
models/avatar/audio.py `audio_net_apply`).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]

SAMPLE_RATE = 16000
N_CEP = 26          # MFCC coefficients (also n mel filters)
N_CONTEXT = 9       # ±9 frames of context
N_INPUT = N_CEP * (2 * N_CONTEXT + 1)   # 494
N_HIDDEN = 2048
N_CHARS = 29
WIN_LEN = 0.025     # python_speech_features defaults (25 ms / 10 ms)
WIN_STEP = 0.01
NFFT = 512
PREEMPH = 0.97
CEPLIFTER = 22
AUDIO_WINDOW = 16   # frames per aud.npy row


# ---------------------------------------------------------------------------
# MFCC (python_speech_features-default math, vectorized)
# ---------------------------------------------------------------------------


def _hz_to_mel(hz):
    return 2595.0 * np.log10(1.0 + np.asarray(hz, np.float64) / 700.0)


def _mel_to_hz(mel):
    return 700.0 * (10.0 ** (np.asarray(mel, np.float64) / 2595.0) - 1.0)


def mel_filterbank(nfilt: int = N_CEP, nfft: int = NFFT,
                   sr: int = SAMPLE_RATE) -> np.ndarray:
    """(nfilt, nfft//2+1) triangular mel filter bank, 0..Nyquist."""
    mels = np.linspace(_hz_to_mel(0), _hz_to_mel(sr / 2), nfilt + 2)
    bins = np.floor((nfft + 1) * _mel_to_hz(mels) / sr).astype(np.int64)
    fb = np.zeros((nfilt, nfft // 2 + 1))
    for m in range(1, nfilt + 1):
        lo, ctr, hi = bins[m - 1], bins[m], bins[m + 1]
        for k in range(lo, ctr):
            fb[m - 1, k] = (k - lo) / max(ctr - lo, 1)
        for k in range(ctr, hi):
            fb[m - 1, k] = (hi - k) / max(hi - ctr, 1)
    return fb


def _dct2_ortho_matrix(n: int) -> np.ndarray:
    """(n, n) DCT-II matrix with 'ortho' norm (scipy.fftpack.dct)."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * k * (2 * i + 1) / (2 * n)) * np.sqrt(2.0 / n)
    m[0] *= 1.0 / np.sqrt(2.0)
    return m


def mfcc(audio: np.ndarray, sr: int = SAMPLE_RATE,
         numcep: int = N_CEP) -> np.ndarray:
    """(S,) float/int16 audio → (T, numcep) MFCC at 100 Hz (pre-stride).

    python_speech_features.mfcc defaults: rectangular window, power
    spectrum |fft|²/NFFT, log mel energies floored at eps, DCT-II
    ortho + lifter, c0 replaced by log frame energy (appendEnergy)."""
    audio = np.asarray(audio, np.float64)
    # preemphasis
    audio = np.append(audio[0], audio[1:] - PREEMPH * audio[:-1])
    flen = int(round(WIN_LEN * sr))          # 400
    fstep = int(round(WIN_STEP * sr))        # 160
    n = len(audio)
    t = 1 if n <= flen else 1 + int(math.ceil((n - flen) / fstep))
    pad = np.zeros(max(0, (t - 1) * fstep + flen - n))
    audio = np.concatenate([audio, pad])
    idx = (np.arange(flen)[None, :]
           + fstep * np.arange(t)[:, None])
    frames = audio[idx]                      # (T, 400) rectangular
    pspec = (np.abs(np.fft.rfft(frames, NFFT)) ** 2) / NFFT
    energy = pspec.sum(axis=1)
    energy = np.where(energy == 0, np.finfo(np.float64).eps, energy)
    fb = mel_filterbank(numcep, NFFT, sr)
    feat = pspec @ fb.T
    feat = np.where(feat == 0, np.finfo(np.float64).eps, feat)
    feat = np.log(feat)
    feat = feat @ _dct2_ortho_matrix(numcep).T[:, :numcep]
    # liftering
    lift = 1 + (CEPLIFTER / 2.0) * np.sin(
        np.pi * np.arange(numcep) / CEPLIFTER)
    feat = feat * lift
    feat[:, 0] = np.log(energy)              # appendEnergy
    return feat.astype(np.float32)


def input_vectors(audio: np.ndarray, sr: int = SAMPLE_RATE) -> np.ndarray:
    """DS-0.1.0 `audiofile_to_input_vector`: MFCC → every 2nd frame
    (50 Hz) → ±9-frame zero-padded context stack → whole-utterance
    (x-mean)/std → (T50, 494)."""
    feat = mfcc(audio, sr)[::2]              # (T50, 26)
    t = feat.shape[0]
    padded = np.concatenate([np.zeros((N_CONTEXT, N_CEP), np.float32),
                             feat,
                             np.zeros((N_CONTEXT, N_CEP), np.float32)])
    ctx = np.stack([padded[i:i + 2 * N_CONTEXT + 1].ravel()
                    for i in range(t)])      # (T50, 494)
    ctx = (ctx - ctx.mean()) / max(ctx.std(), 1e-8)
    return ctx.astype(np.float32)


# ---------------------------------------------------------------------------
# DeepSpeech 0.1.0 network (JAX)
# ---------------------------------------------------------------------------


def _dense_init(key, cin, cout):
    kw, kb = jax.random.split(key)
    s = 1.0 / math.sqrt(cin)
    return {"weight": jax.random.uniform(kw, (cin, cout), jnp.float32,
                                         -s, s),
            "bias": jnp.zeros((cout,), jnp.float32)}


def _lstm_init(key, cin, units):
    # TF BasicLSTMCell: one kernel (cin+units, 4*units), gates i,j,f,o
    kw, kb = jax.random.split(key)
    s = 1.0 / math.sqrt(cin + units)
    return {"kernel": jax.random.uniform(kw, (cin + units, 4 * units),
                                         jnp.float32, -s, s),
            "bias": jnp.zeros((4 * units,), jnp.float32)}


def init_deepspeech(key) -> Params:
    ks = jax.random.split(key, 7)
    return {"h1": _dense_init(ks[0], N_INPUT, N_HIDDEN),
            "h2": _dense_init(ks[1], N_HIDDEN, N_HIDDEN),
            "h3": _dense_init(ks[2], N_HIDDEN, N_HIDDEN),
            "lstm_fw": _lstm_init(ks[3], N_HIDDEN, N_HIDDEN),
            "lstm_bw": _lstm_init(ks[4], N_HIDDEN, N_HIDDEN),
            "h5": _dense_init(ks[5], 2 * N_HIDDEN, N_HIDDEN),
            "logits": _dense_init(ks[6], N_HIDDEN, N_CHARS)}


def _clipped_relu(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 20.0)


def _lstm_scan(p: Params, xs: jax.Array, reverse: bool = False,
               real: jax.Array | None = None):
    """BasicLSTMCell over time: xs (T, F) → hidden states (T, units).
    TF gate order (i, j, f, o), forget_bias=1.0, tanh activations.

    `real` (T,) bool marks true-utterance steps: pad steps pass the
    carry through unchanged, so a length-bucket zero pad at the tail
    cannot leak into real outputs (critical for reverse=True, where
    the scan consumes the pad BEFORE the utterance)."""
    units = p["kernel"].shape[1] // 4

    def cell(carry, inp):
        x, r = inp
        c0, h0 = carry
        z = jnp.concatenate([x, h0]) @ p["kernel"] + p["bias"]
        i, j, f, o = jnp.split(z, 4)
        c = jax.nn.sigmoid(f + 1.0) * c0 + jax.nn.sigmoid(i) * jnp.tanh(j)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        c = jnp.where(r, c, c0)
        h = jnp.where(r, h, h0)
        return (c, h), h

    if real is None:
        real = jnp.ones((xs.shape[0],), bool)
    init = (jnp.zeros(units), jnp.zeros(units))
    _, hs = jax.lax.scan(cell, init, (xs, real), reverse=reverse)
    return hs


@jax.jit
def deepspeech_apply(params: Params, x: jax.Array,
                     t: jax.Array | int | None = None) -> jax.Array:
    """x (T, 494) context vectors → (T, 29) logits. `t` = true
    utterance length when x carries a length-bucket tail pad (rows
    ≥ t are masked out of both LSTM carries; outputs there are
    meaningless and should be sliced off)."""
    if t is None:
        t = x.shape[0]
    real = jnp.arange(x.shape[0]) < t
    h = _clipped_relu(x @ params["h1"]["weight"] + params["h1"]["bias"])
    h = _clipped_relu(h @ params["h2"]["weight"] + params["h2"]["bias"])
    h = _clipped_relu(h @ params["h3"]["weight"] + params["h3"]["bias"])
    fw = _lstm_scan(params["lstm_fw"], h, real=real)
    bw = _lstm_scan(params["lstm_bw"], h, reverse=True, real=real)
    h = jnp.concatenate([fw, bw], axis=-1)
    h = _clipped_relu(h @ params["h5"]["weight"] + params["h5"]["bias"])
    return h @ params["logits"]["weight"] + params["logits"]["bias"]


# ---------------------------------------------------------------------------
# 50 Hz → video-fps resampling + windowing (AD-NeRF conventions)
# ---------------------------------------------------------------------------


def interpolate_features(feats: np.ndarray, input_rate: float,
                         output_rate: float,
                         output_len: int | None = None) -> np.ndarray:
    """Per-dim linear resampling (T_in, C) → (T_out, C)."""
    t_in = feats.shape[0]
    if output_len is None:
        output_len = int(t_in * output_rate / input_rate)
    tin = np.arange(t_in) / input_rate
    tout = np.arange(output_len) / output_rate
    return np.stack([np.interp(tout, tin, feats[:, i])
                     for i in range(feats.shape[1])],
                    axis=1).astype(np.float32)


def window_features(feats: np.ndarray,
                    win: int = AUDIO_WINDOW) -> np.ndarray:
    """(N, C) per-frame features → (N, win, C) zero-padded sliding
    windows centered per frame (matches the smo-window convention the
    dataset layer applies on top, data/dataset.py)."""
    n, c = feats.shape
    half = win // 2
    out = np.zeros((n, win, c), np.float32)
    for i in range(n):
        lo, hi = i - half, i + half
        slo, shi = max(lo, 0), min(hi, n)
        out[i, slo - lo:shi - lo] = feats[slo:shi]
    return out


def extract_features(params: Params, audio: np.ndarray,
                     sr: int = SAMPLE_RATE, fps: float = 25.0,
                     n_frames: int | None = None,
                     pad_to: int = 512) -> np.ndarray:
    """16 kHz mono wav samples → aud.npy array (n_frames, 16, 29).

    Utterances are zero-padded to a multiple of `pad_to` network steps
    so the jitted net compiles once per length bucket, not per clip."""
    vec = input_vectors(audio, sr)
    t = vec.shape[0]
    t_pad = -(-t // pad_to) * pad_to
    if t_pad != t:
        vec = np.concatenate(
            [vec, np.zeros((t_pad - t, vec.shape[1]), np.float32)])
    logits = np.asarray(deepspeech_apply(params, jnp.asarray(vec), t))[:t]
    if n_frames is None:
        n_frames = int(t * fps / 50.0)
    resampled = interpolate_features(logits, 50.0, fps, n_frames)
    return window_features(resampled)


def load_or_init(path: str | None, key=None) -> Params:
    """Converted-npz weights when available, random otherwise (loud)."""
    if path:
        from ..utils import pytree_io
        return pytree_io.load_pytree(path)
    import logging
    logging.getLogger(__name__).warning(
        "DeepSpeech weights not provided — using RANDOM weights; "
        "aud.npy content will not match AD-NeRF's. Convert the public "
        "deepspeech-0.1.0 checkpoint with tools/convert_deepspeech.py.")
    return init_deepspeech(key if key is not None
                           else jax.random.PRNGKey(0))
