"""Audio codec stand-ins + SNR math (driver- and executor-side numpy).

Real audio codecs (libflac/libopus via soundfile/av) are NOT in this
container, so the *codec layer* is a deterministic stand-in behind the same
interface, clearly marked. Everything Spark-side — schema (binary column),
Arrow batching, UDF signatures, partitioning — is real and is what matters
at 100 TB. Swapping in real codecs means replacing `encode`/`decode` bodies
only.

Stand-in codecs (all deterministic, all little-endian):
- ``pcm_s16le``: raw PCM16 — byte-identical round trip.
- ``flac``: zlib-compressed PCM16 with a 'fLaC'-tagged header — lossless
  round trip (models a lossless codec).
- ``opus``: PCM quantized to 12 bits then zlib-compressed, 'OggS'-tagged —
  lossy round trip at ~74 dB SNR (models a lossy codec that still clears
  the 30 dB invariant).

The per-row invariant (BASELINE.json input_hint): decoded PCM must be
allclose to the deterministically regenerated reference signal at
SNR >= 30 dB, plus exact transcript equality. If a real codec is wanted,
replace `decode` and raise NotImplementedError for unknown codecs.
"""

from __future__ import annotations

import hashlib
import io
import struct
import zlib

import numpy as np

# Optional-dependency seam: with soundfile/libsndfile present (real
# clusters), payloads that are NOT the deterministic stand-in containers
# decode through libsndfile via the same `decode` entry point; absent (this
# container), unknown payloads stay structural violations. Probed once per
# process.
try:  # pragma: no cover - not installed in this container
    import soundfile as _soundfile
except ImportError:
    _soundfile = None

SNR_THRESHOLD_DB = 30.0

_FLAC_MAGIC = b"fLaC"
_OPUS_MAGIC = b"OggS"

KNOWN_CODECS = ("pcm_s16le", "flac", "opus", "mulaw")

# --------------------------------------------------------------------------
# ITU-T G.711 mu-law — a REAL codec, not a stand-in (pure integer spec,
# no external library): the telephony ingest format (RTP PCMU, .ul files,
# call-center corpora). 1 byte/sample, headerless, 8 log segments.
# --------------------------------------------------------------------------

_G711_BIAS = 0x84  # 132
_G711_CLIP = 32635


def mulaw_compress(pcm: np.ndarray) -> np.ndarray:
    """int16 PCM → uint8 G.711 mu-law (vectorized, bit-exact to the spec)."""
    x = pcm.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), _G711_CLIP) + _G711_BIAS
    # exponent = floor(log2(mag)) - 7 in [0, 7]; np.frexp is exact on
    # integers (mag = m * 2^e, 0.5 <= m < 1 → e = floor(log2) + 1), unlike
    # float log2 whose rounding can cross a power-of-two boundary
    exp = np.clip(np.frexp(mag.astype(np.float64))[1] - 8, 0, 7)
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def mulaw_expand(u: np.ndarray) -> np.ndarray:
    """uint8 G.711 mu-law → int16 PCM (exact inverse of the spec tables)."""
    c = (~u.astype(np.int32)) & 0xFF
    exp = (c >> 4) & 0x07
    mag = (((c & 0x0F) << 3) + _G711_BIAS << exp) - _G711_BIAS
    return np.where(c & 0x80, -mag, mag).astype(np.int16)


def clip_seed(clip_id: str) -> int:
    """Stable 64-bit seed from a clip_id (md5 prefix — any stable hash works)."""
    return int.from_bytes(hashlib.md5(clip_id.encode()).digest()[:8], "little")


def synth_pcm_n(clip_id: str, sr_hz: int, n: int) -> np.ndarray:
    """Deterministic PCM16 signal of exactly n samples: seeded sine + noise.

    Same recipe on generator and checker side, so the SNR check is exact;
    the checker infers n from the decoded payload length.
    """
    n = max(1, n)
    rng = np.random.default_rng(clip_seed(clip_id))
    t = np.arange(n, dtype=np.float64) / sr_hz
    f0 = 100.0 + rng.uniform(0, 1000.0)
    sig = 0.6 * np.sin(2 * np.pi * f0 * t) + 0.1 * rng.standard_normal(n)
    pcm = np.clip(sig * 16384.0, -32768, 32767).astype(np.int16)
    return pcm


def synth_pcm(clip_id: str, sr_hz: int, dur_ms: int) -> np.ndarray:
    """Deterministic PCM16 signal for a clip of dur_ms milliseconds."""
    return synth_pcm_n(clip_id, sr_hz, int(sr_hz * dur_ms / 1000))


def encode(pcm: np.ndarray, codec: str) -> bytes:
    """Encode int16 PCM under the stand-in codec."""
    raw = pcm.astype("<i2").tobytes()
    if codec == "pcm_s16le":
        return raw
    if codec == "flac":
        return _FLAC_MAGIC + struct.pack("<I", len(pcm)) + zlib.compress(raw, 1)
    if codec == "opus":
        # 12-bit quantization: SNR ~ 6.02*12 + 1.76 ≈ 74 dB — lossy but well
        # above the 30 dB invariant for uncorrupted payloads.
        q = (pcm.astype(np.int32) >> 4).astype("<i2").tobytes()
        return _OPUS_MAGIC + struct.pack("<I", len(pcm)) + zlib.compress(q, 1)
    if codec == "mulaw":
        # real G.711: raw headerless stream, 1 byte/sample (RTP PCMU wire)
        return mulaw_compress(pcm).tobytes()
    raise NotImplementedError(f"unknown codec {codec!r}")


def _decode_standin(payload: bytes, codec: str) -> np.ndarray | None:
    """The deterministic stand-in containers only; None on any mismatch."""
    try:
        if codec == "pcm_s16le":
            if len(payload) % 2:
                return None
            return np.frombuffer(payload, dtype="<i2")
        if codec == "flac":
            if payload[:4] != _FLAC_MAGIC:
                return None
            (n,) = struct.unpack("<I", payload[4:8])
            raw = zlib.decompress(payload[8:])
            pcm = np.frombuffer(raw, dtype="<i2")
            return pcm if len(pcm) == n else None
        if codec == "opus":
            if payload[:4] != _OPUS_MAGIC:
                return None
            (n,) = struct.unpack("<I", payload[4:8])
            raw = zlib.decompress(payload[8:])
            q = np.frombuffer(raw, dtype="<i2")
            if len(q) != n:
                return None
            return (q.astype(np.int32) << 4).astype(np.int16)
        if codec == "mulaw":
            # headerless by spec: every byte is a sample (no structure to
            # validate — exactly like a raw PCMU capture)
            return mulaw_expand(np.frombuffer(payload, dtype=np.uint8))
        return None
    except Exception:
        return None


def decode(payload: bytes, codec: str) -> np.ndarray | None:
    """Decode to int16 PCM; None when the payload is structurally invalid.

    Stand-in containers decode directly; anything else (a REAL flac/opus/
    wav payload, or a codec the stand-ins don't model) goes through
    libsndfile when soundfile is importable — so the same call sites upgrade
    to real codecs on a cluster that has the library, with no plan change.
    """
    pcm = _decode_standin(payload, codec)
    if pcm is not None:
        return pcm
    if _soundfile is not None:  # pragma: no cover - real-codec seam
        try:
            data, _sr = _soundfile.read(io.BytesIO(payload), dtype="int16")
            return data if data.ndim == 1 else data[:, 0]
        except Exception:
            return None
    return None  # unknown codec → structural violation, not a crash


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    """Signal-to-noise ratio of `test` against reference signal `ref` in dB."""
    if ref.shape != test.shape:
        return float("-inf")
    r = ref.astype(np.float64)
    e = r - test.astype(np.float64)
    p_sig = float(np.mean(r * r))
    p_err = float(np.mean(e * e))
    if p_err == 0.0:
        return float("inf")
    if p_sig == 0.0:
        return float("-inf")
    return 10.0 * np.log10(p_sig / p_err)
