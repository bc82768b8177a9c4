"""Audio feature extraction CLI: 16 kHz wav → aud.npy (N, 16, 29).

Replaces the reference's external AD-NeRF/DeepSpeech tooling
(reference README.md:41: "use ffmpeg to extract the audio in WAV format
and then extract the features ... named aud.npy"; consumed at
code/dataset.py:404). Runs the native DeepSpeech-0.1.0 reimplementation
(preprocess/deepspeech.py); weights convert from the public checkpoint
via tools/convert_deepspeech.py — random weights otherwise (loud
warning; structure/contract testing only).

Usage:
    python -m hfa_gp_tpu.cli.extract_audio --wav sp.wav \
        --out datasets/obama/person_1/aud.npy --fps 25 \
        [--weights ds.npz] [--n_frames N]
"""

from __future__ import annotations

import argparse
import sys
import wave

import numpy as np


def load_wav(path: str) -> tuple[np.ndarray, int]:
    """Mono float samples + sample rate from a PCM wav (stdlib only —
    no ffmpeg/librosa in this image; utils/video.py has the same
    constraint)."""
    with wave.open(path, "rb") as f:
        sr = f.getframerate()
        n = f.getnframes()
        width = f.getsampwidth()
        ch = f.getnchannels()
        raw = f.readframes(n)
    if width == 3:
        # 24-bit PCM: sign-extend each little-endian triple into int32
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        audio = (b[:, 0].astype(np.int32)
                 | (b[:, 1].astype(np.int32) << 8)
                 | (b[:, 2].astype(np.int8).astype(np.int32) << 16)
                 ).astype(np.float32)
    elif width in (1, 2, 4):
        dtype = {1: np.uint8, 2: np.int16, 4: np.int32}[width]
        audio = np.frombuffer(raw, dtype=dtype).astype(np.float32)
        if width == 1:
            audio = audio - 128.0
    else:
        raise ValueError(f"unsupported wav sample width {width} bytes "
                         f"(supported: 8/16/24/32-bit PCM)")
    if ch > 1:
        audio = audio.reshape(-1, ch).mean(axis=1)
    return audio, sr


def resample_linear(audio: np.ndarray, sr: int, target: int) -> np.ndarray:
    if sr == target:
        return audio
    n_out = int(round(len(audio) * target / sr))
    t_in = np.arange(len(audio)) / sr
    t_out = np.arange(n_out) / target
    return np.interp(t_out, t_in, audio).astype(np.float32)


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--wav", type=str, required=True)
    p.add_argument("--out", type=str, required=True,
                   help="output aud.npy path")
    p.add_argument("--fps", type=float, default=25.0,
                   help="video frame rate the features lock to")
    p.add_argument("--n_frames", type=int, default=None,
                   help="pin the output frame count (video-locked)")
    p.add_argument("--weights", type=str, default=None,
                   help="converted deepspeech npz "
                        "(tools/convert_deepspeech.py)")
    return p


def main(args) -> None:
    from ..preprocess import deepspeech as ds

    audio, sr = load_wav(args.wav)
    audio = resample_linear(audio, sr, ds.SAMPLE_RATE)
    params = ds.load_or_init(args.weights)
    feats = ds.extract_features(params, audio, fps=args.fps,
                                n_frames=args.n_frames)
    np.save(args.out, feats)
    print(f"wrote {args.out}: {feats.shape} "
          f"({len(audio) / ds.SAMPLE_RATE:.1f}s of audio)")


if __name__ == "__main__":
    main(build_argparser().parse_args(sys.argv[1:]))
