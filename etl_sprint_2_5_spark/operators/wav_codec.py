"""Pure-stdlib WAV (PCM) codec — the REAL audio codec for the
multimodal stage family (operators/multimodal.py ``decode_audio``),
via Python's built-in ``wave`` module + numpy: the container ships no
torchaudio/ffmpeg, but RIFF/WAVE PCM needs neither.

Scope: 16-bit PCM (the interchange default), any channel count and
sample rate; compressed WAV (ADPCM/float) raises ValueError by name.
Same execution model as the PNG codec: called per-row inside
Arrow-batched ``mapInPandas`` stages, blobs only cross into Python for
the decode itself.
"""

from __future__ import annotations

import io
import wave

import numpy as np


def wav_encode(samples: np.ndarray, rate: int) -> bytes:
    """Encode int16 samples — (n,) mono or (n, ch) — as PCM WAV."""
    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise ValueError(f"unsupported sample shape {samples.shape}")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(a.shape[1])
        w.setsampwidth(2)
        w.setframerate(int(rate))
        w.writeframes(a.tobytes())
    return buf.getvalue()


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV blob → ((n_frames, channels) int16 array,
    sample_rate). Compressed or non-16-bit WAVs raise ValueError by
    name; a malformed RIFF container raises ValueError too (loud
    failure, never garbage audio)."""
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            if w.getcomptype() != "NONE":
                raise ValueError(
                    f"unsupported WAV compression {w.getcomptype()!r}"
                )
            if w.getsampwidth() != 2:
                raise ValueError(
                    f"unsupported WAV sample width {w.getsampwidth()} "
                    "bytes (16-bit PCM only)"
                )
            ch, rate, n = w.getnchannels(), w.getframerate(), w.getnframes()
            raw = w.readframes(n)
    except (wave.Error, EOFError, RuntimeError) as e:
        # stdlib wave/chunk raise wave.Error, EOFError, or (chunk.py's
        # seek on a lying RIFF size header) a bare RuntimeError — all
        # mean the same thing here: the container is malformed
        raise ValueError(f"malformed WAV: {e or 'truncated header'}") from e
    if len(raw) != n * 2 * ch:
        raise ValueError(
            f"truncated WAV data: {len(raw)} bytes for {n} frames × "
            f"{ch} ch × 2 bytes"
        )
    a = np.frombuffer(raw, dtype="<i2")
    return a.reshape(-1, ch if ch else 1), rate
