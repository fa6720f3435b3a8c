"""Self-implemented audio/video payload codecs (no media libs in this
container — same constraint and approach as functions/codecs.py for images).

Audio: standard RIFF/WAVE PCM16 mono/stereo, decoded with stdlib ``wave`` +
numpy — WAV is a public container simple enough to support for real.

Video: there is no self-implementable standard video codec, so the engine
defines ``fvc`` (frame-container), a trivial documented format used by the
tests and the synthetic corpus: a header + N length-prefixed frames, each an
image in one of the engine's own formats (raw/png/qnt). The *sampling,
decoding and Ray plumbing* around it are real; swapping in mp4/webm on a
cluster with codec libs only changes this module.

    fvc layout: b"FVC1" | u32 n_frames | u32 fps_milli |
                n_frames x (u32 byte_len | frame_bytes)
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

from dedup_ray.functions import codecs

# ----------------------------------------------------------------- audio


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """float samples in [-1, 1] (1-D mono or (n, 2) stereo) -> WAV PCM16."""
    if samples.ndim == 1:
        samples = samples[:, None]
    pcm = np.clip(np.round(samples * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(pcm.shape[1])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV PCM16 -> (float32 mono samples in [-1, 1], sample_rate)."""
    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError("only PCM16 supported")
        sr = w.getframerate()
        raw = w.readframes(w.getnframes())
        pcm = np.frombuffer(raw, dtype="<i2").reshape(-1, w.getnchannels())
    return (pcm.astype(np.float32) / 32768.0).mean(axis=1), sr


def audio_features(samples: np.ndarray, sr: int, n_bands: int = 8) -> dict:
    """Deterministic per-clip features: duration, RMS, zero-crossing rate,
    and ``n_bands`` log-spaced FFT band energies (numpy rfft — no scipy)."""
    n = samples.size
    dur = n / sr if sr else 0.0
    rms = float(np.sqrt(np.mean(samples**2))) if n else 0.0
    zcr = float(np.mean(samples[1:] * samples[:-1] < 0)) if n > 1 else 0.0
    if n >= 2:
        spec = np.abs(np.fft.rfft(samples)) ** 2
        edges = np.unique(
            np.geomspace(1, spec.size - 1, n_bands + 1).astype(np.int64)
        )
        bands = np.add.reduceat(spec, edges[:-1])
        bands = bands / max(bands.sum(), 1e-12)
        if bands.size < n_bands:  # degenerate tiny clips
            bands = np.pad(bands, (0, n_bands - bands.size))
    else:
        bands = np.zeros(n_bands)
    return {
        "duration_s": round(dur, 6),
        "rms": round(rms, 6),
        "zcr": round(zcr, 6),
        "band_energy": np.round(bands, 6).astype(np.float32),
    }


# ----------------------------------------------------------------- video

_FVC_MAGIC = b"FVC1"


def encode_fvc(frames: list[np.ndarray], fmt: str = "raw", fps: float = 30.0) -> bytes:
    parts = [_FVC_MAGIC, struct.pack("<II", len(frames), int(fps * 1000))]
    for f in frames:
        b = codecs.encode(f, fmt)
        parts.append(struct.pack("<I", len(b)))
        parts.append(b)
    return b"".join(parts)


def fvc_frame_count(data: bytes) -> tuple[int, float]:
    if data[:4] != _FVC_MAGIC:
        raise ValueError("not an fvc container")
    n, fps_m = struct.unpack("<II", data[4:12])
    return n, fps_m / 1000.0


def iter_fvc_frames(data: bytes):
    """Yield (frame_idx, frame_bytes) WITHOUT decoding pixels — sampling
    stays cheap; callers decode only the frames they keep."""
    n, _ = fvc_frame_count(data)
    pos = 12
    for i in range(n):
        (ln,) = struct.unpack("<I", data[pos : pos + 4])
        pos += 4
        yield i, data[pos : pos + ln]
        pos += ln
