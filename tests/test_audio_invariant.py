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
