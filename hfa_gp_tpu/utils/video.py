"""Video assembly.

Preferred path: imageio + libx264 (what the reference uses,
run_recon_video_rgb.py:240,259). This image has no ffmpeg backend, so the
fallback is a dependency-free MJPEG-AVI muxer (JPEG frames from PIL in a
RIFF AVI container — plays in VLC/ffmpeg/browsers with AVI support).
"""

from __future__ import annotations

import io
import os
import struct

import numpy as np
from PIL import Image


def _try_imageio_writer(path: str, fps: int):
    try:
        import imageio
        w = imageio.get_writer(path, mode="I", fps=fps, codec="libx264",
                               bitrate="12M")
        # probe: some backends only fail on first append; force plugin init
        return w
    except Exception:
        return None


def write_mjpeg_avi(frames, path: str, fps: int = 24,
                    quality: int = 90) -> None:
    """frames: iterable of (H, W, 3) uint8 arrays."""
    jpegs = []
    size = None
    for arr in frames:
        if size is None:
            size = (arr.shape[1], arr.shape[0])
        buf = io.BytesIO()
        Image.fromarray(arr, "RGB").save(buf, "JPEG", quality=quality)
        data = buf.getvalue()
        if len(data) % 2:
            data += b"\x00"
        jpegs.append(data)
    if not jpegs:
        raise ValueError("no frames")
    w, h = size
    n = len(jpegs)
    max_size = max(len(j) for j in jpegs)

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(payload)) + payload \
            + (b"\x00" if len(payload) % 2 else b"")

    def lst(fourcc: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", fourcc + payload)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        int(1e6 / fps), max_size * fps, 0, 0x10, n, 0, 1, max_size,
        w, h, 0, 0, 0, 0)
    strh = b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIIIhhhh", 0, 0, 0, 0, 1, fps, 0, n, max_size,
        0xFFFFFFFF & -1, 0, 0, 0, w, h)
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_payload = b"".join(chunk(b"00dc", j) for j in jpegs)
    movi = lst(b"movi", movi_payload)

    idx_entries = []
    offset = 4
    for j in jpegs:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, offset,
                                       len(j)))
        offset += 8 + len(j)
    idx1 = chunk(b"idx1", b"".join(idx_entries))

    body = b"AVI " + hdrl + movi + idx1
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)


def write_video_frames(frames, path: str, fps: int = 24) -> str:
    """Write frames ((H,W,3) uint8) to `path`; returns the actual path
    (extension may change to .avi in the MJPEG fallback)."""
    frames = list(frames)
    writer = _try_imageio_writer(path, fps)
    if writer is not None:
        try:
            for f in frames:
                writer.append_data(f)
            writer.close()
            return path
        except Exception:
            try:
                writer.close()
            except Exception:
                pass
            if os.path.exists(path):
                os.remove(path)
    avi_path = os.path.splitext(path)[0] + ".avi"
    write_mjpeg_avi(frames, avi_path, fps=fps)
    return avi_path
