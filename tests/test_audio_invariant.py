"""Audio codec round-trips + vectorized invariant goldens."""

from __future__ import annotations

import numpy as np
import pytest

from baskerville_spark import audio
from baskerville_spark.checks.invariants import audio_invariant
from baskerville_spark.generator import (
    canonical_clip_id,
    expected_violation_indices,
)


@pytest.mark.parametrize("codec", ["pcm_s16le", "flac", "opus"])
def test_codec_roundtrip_snr(codec):
    pcm = audio.synth_pcm("clip_000000000001", 16000, 200)
    enc = audio.encode(pcm, codec)
    dec = audio.decode(enc, codec)
    assert dec is not None and len(dec) == len(pcm)
    s = audio.snr_db(pcm, dec)
    if codec == "opus":
        assert 40 < s < 100  # lossy stand-in, still far above 30 dB
    else:
        assert s == float("inf")  # lossless round trip


def test_decode_rejects_garbage():
    assert audio.decode(b"notaheader123", "flac") is None
    assert audio.decode(b"xx", "mp3") is None
    assert audio.decode(b"\x00" * 7, "pcm_s16le") is None  # odd length


def test_unknown_codec_encode_raises():
    with pytest.raises(NotImplementedError):
        audio.encode(np.zeros(4, dtype=np.int16), "mp3")


def test_invariant_goldens(spark, t1_clips, t1_tref, t1_cfg):
    res = audio_invariant(t1_clips, t1_tref).collect()
    by_id = {}
    for r in res:
        by_id.setdefault(r["clip_id"], []).append(r)

    exp = expected_violation_indices(t1_cfg)
    # injected SNR corruptions fail; everything in clean partition passes
    for i in exp["snr"]:
        rows = by_id[canonical_clip_id(i)]
        assert any(not r["snr_ok"] and r["decode_ok"] for r in rows), i
    for i in exp["transcript_eq"]:
        rows = by_id[canonical_clip_id(i)]
        assert any(r["transcript_ok"] is False for r in rows), i
    # clean partition: all pass both invariants
    n_clean = 0
    for r in res:
        if r["part_id"] == 0:
            assert r["snr_ok"] and r["decode_ok"]
            assert r["transcript_ok"] is not False
            n_clean += 1
    assert n_clean == t1_cfg.n_rows // t1_cfg.n_parts


def test_mulaw_codec_bit_exact_and_invariant():
    """G.711 mu-law: bit-exact to a scalar spec reference over the FULL
    int16 domain, quantization bounded by the top-segment half-step, and
    the transcode clears the 30 dB SNR invariant (textbook ~38 dB)."""
    import numpy as np

    from baskerville_spark import audio

    def ref_enc(x):
        sign = 0x80 if x < 0 else 0
        mag = min(abs(int(x)), 32635) + 0x84
        exp = next(e for e in range(8) if mag < (1 << (e + 8)))
        return ~(sign | (exp << 4) | ((mag >> (exp + 3)) & 0x0F)) & 0xFF

    def ref_dec(u):
        c = ~u & 0xFF
        mag = ((((c & 0x0F) << 3) + 0x84) << ((c >> 4) & 7)) - 0x84
        return -mag if c & 0x80 else mag

    xs = np.arange(-32768, 32768, dtype=np.int16)
    enc = audio.mulaw_compress(xs)
    assert (enc == np.array([ref_enc(int(x)) for x in xs], np.uint8)).all()
    dec = audio.mulaw_expand(enc)
    assert (dec == np.array([ref_dec(int(u)) for u in enc], np.int16)).all()
    err = np.abs(dec.astype(np.int32) - np.clip(xs, -32635, 32635).astype(np.int32))
    assert err.max() <= 512  # half the segment-7 step

    # codec-layer round trip: 1 byte/sample wire, >= 30 dB on speech-band
    pcm = audio.synth_pcm("clip_000000000042", 8000, 500)
    payload = audio.encode(pcm, "mulaw")
    assert len(payload) == len(pcm)
    back = audio.decode(payload, "mulaw")
    assert audio.snr_db(pcm, back) >= audio.SNR_THRESHOLD_DB
