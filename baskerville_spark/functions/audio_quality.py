"""Audio loudness / clipping QA: per-clip level statistics.

The standard audio-ingest QA trio — peak level, RMS level (both in dBFS,
full scale = 32768 for int16), and clipped-sample detection (|x| at full
scale) — computed in ONE Arrow pass over the payload column, narrow rows
out, same decode discipline as the SNR invariant (checks/invariants.py).
Flags the real-world ingest failures metadata checks can't see: silent
uploads (rms ~ -inf), hot/clipped masters, gain-mismatched batches.

Reference seam: Baskerville has no audio-signal operators (its features
are request-set statistics); this is a from-scratch extension for the
audio graft cell, gated analytically (q83: synthesized constant-level
clips whose exact dBFS/clipping counts are closed-form).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from baskerville_spark import audio

FULL_SCALE = 32768.0
CLIP_LEVEL = 32767  # |sample| >= this counts as clipped

LOUDNESS_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.IntegerType(), True),
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("n_clipped", T.LongType(), True),
        T.StructField("peak_dbfs", T.DoubleType(), True),
        T.StructField("rms_dbfs", T.DoubleType(), True),
    ]
)

_ARROW_LOUD = pa.schema(
    [
        pa.field("part_id", pa.int32()),
        pa.field("clip_id", pa.string()),
        pa.field("decode_ok", pa.bool_()),
        pa.field("n_samples", pa.int64()),
        pa.field("n_clipped", pa.int64()),
        pa.field("peak_dbfs", pa.float64()),
        pa.field("rms_dbfs", pa.float64()),
    ]
)


def _require_cols(df: DataFrame, names: tuple[str, ...]) -> None:
    """Fail loudly on a missing payload column: pyarrow's
    ``get_field_index`` returns -1 for unknown names and ``column(-1)``
    silently binds the LAST column — a schema mistake must read as an
    error, never as "no data" or cross-bound garbage (round-5 review)."""
    missing = [n for n in names if n not in df.columns]
    if missing:
        raise ValueError(
            f"missing required column(s) {missing}; frame has {df.columns}"
        )


def _opt_part_ids(b: pa.RecordBatch) -> pa.Array:
    """part_id column if present, else typed NULLs (never column(-1))."""
    idx = b.schema.get_field_index("part_id")
    return b.column(idx).cast(pa.int32()) if idx >= 0 else pa.nulls(
        len(b), pa.int32()
    )


def _loudness_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for b in batches:
        payloads = b.column(b.schema.get_field_index("bytes"))
        codecs = b.column(b.schema.get_field_index("codec")).to_pylist()
        clip_ids = b.column(b.schema.get_field_index("clip_id")).to_pylist()
        part_ids = _opt_part_ids(b)
        n = len(b)
        oks = [False] * n
        n_samps: list[int | None] = [None] * n
        n_clips: list[int | None] = [None] * n
        peaks: list[float | None] = [None] * n
        rmss: list[float | None] = [None] * n
        for i in range(n):
            pv = payloads[i]
            payload = pv.as_py() if pv.is_valid else None
            pcm = audio.decode(payload, codecs[i]) if payload is not None else None
            if pcm is None or len(pcm) == 0:
                continue
            oks[i] = True
            x = np.abs(pcm.astype(np.float64))
            n_samps[i] = int(len(x))
            n_clips[i] = int((x >= CLIP_LEVEL).sum())
            peak = x.max()
            rms = float(np.sqrt((x * x).mean()))
            # silent clips: dBFS undefined -> NULL (not -inf, which breaks
            # parquet/arrow round trips and every downstream comparison)
            peaks[i] = 20.0 * np.log10(peak / FULL_SCALE) if peak > 0 else None
            rmss[i] = 20.0 * np.log10(rms / FULL_SCALE) if rms > 0 else None
        yield pa.RecordBatch.from_arrays(
            [
                part_ids,
                pa.array(clip_ids, pa.string()),
                pa.array(oks, pa.bool_()),
                pa.array(n_samps, pa.int64()),
                pa.array(n_clips, pa.int64()),
                pa.array(peaks, pa.float64()),
                pa.array(rmss, pa.float64()),
            ],
            schema=_ARROW_LOUD,
        )


def audio_loudness_stats(clips: DataFrame) -> DataFrame:
    """(part_id, clip_id, decode_ok, n_samples, n_clipped, peak_dbfs,
    rms_dbfs) — one decode per payload, narrow rows out."""
    _require_cols(clips, ("clip_id", "bytes", "codec"))
    cols = [c for c in ("part_id", "clip_id", "bytes", "codec") if c in clips.columns]
    return clips.select(*cols).mapInArrow(_loudness_batches, schema=LOUDNESS_SCHEMA)


SPECTRAL_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.IntegerType(), True),
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("dominant_bin", T.IntegerType(), True),
        T.StructField("spectral_centroid", T.DoubleType(), True),
    ]
)

_ARROW_SPEC = pa.schema(
    [
        pa.field("part_id", pa.int32()),
        pa.field("clip_id", pa.string()),
        pa.field("decode_ok", pa.bool_()),
        pa.field("n_samples", pa.int64()),
        pa.field("dominant_bin", pa.int32()),
        pa.field("spectral_centroid", pa.float64()),
    ]
)


def audio_spectral_features(clips: DataFrame, n_fft: int = 256) -> DataFrame:
    """Per-clip spectral features over the first ``n_fft`` samples (zero-pad
    shorter clips): ``dominant_bin`` = argmax rFFT magnitude over bins
    1..n_fft/2 (DC excluded) and ``spectral_centroid`` = magnitude-weighted
    mean bin. The cheap frequency-content screen: silence/DC-only uploads,
    band-limited junk, and sr-mislabel suspects (content above the declared
    Nyquist) all show up here without a full spectrogram pipeline.

    One Arrow pass, one small numpy rFFT per clip (O(n_fft log n_fft) —
    constant per row, independent of clip length), narrow rows out.
    """

    _require_cols(clips, ("clip_id", "bytes", "codec"))

    def _spec(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            payloads = b.column(b.schema.get_field_index("bytes"))
            codecs = b.column(b.schema.get_field_index("codec")).to_pylist()
            clip_ids = b.column(b.schema.get_field_index("clip_id")).to_pylist()
            part_ids = _opt_part_ids(b)
            n = len(b)
            oks = [False] * n
            n_samps: list[int | None] = [None] * n
            bins: list[int | None] = [None] * n
            cents: list[float | None] = [None] * n
            for i in range(n):
                pv = payloads[i]
                payload = pv.as_py() if pv.is_valid else None
                pcm = audio.decode(payload, codecs[i]) if payload is not None else None
                if pcm is None or len(pcm) == 0:
                    continue
                oks[i] = True
                n_samps[i] = int(len(pcm))
                x = pcm[:n_fft].astype(np.float64)
                if len(x) < n_fft:
                    x = np.concatenate([x, np.zeros(n_fft - len(x))])
                mag = np.abs(np.fft.rfft(x))[1:]  # drop DC
                if mag.sum() <= 0:
                    continue  # silent: bins stay NULL
                bins[i] = int(mag.argmax()) + 1
                k = np.arange(1, len(mag) + 1, dtype=np.float64)
                cents[i] = float((k * mag).sum() / mag.sum())
            yield pa.RecordBatch.from_arrays(
                [
                    part_ids,
                    pa.array(clip_ids, pa.string()),
                    pa.array(oks, pa.bool_()),
                    pa.array(n_samps, pa.int64()),
                    pa.array(bins, pa.int32()),
                    pa.array(cents, pa.float64()),
                ],
                schema=_ARROW_SPEC,
            )

    cols = [c for c in ("part_id", "clip_id", "bytes", "codec") if c in clips.columns]
    return clips.select(*cols).mapInArrow(_spec, schema=SPECTRAL_SCHEMA)


DC_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.IntegerType(), True),
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("dc_mean", T.DoubleType(), True),
    ]
)

_ARROW_DC = pa.schema(
    [
        pa.field("part_id", pa.int32()),
        pa.field("clip_id", pa.string()),
        pa.field("decode_ok", pa.bool_()),
        pa.field("n_samples", pa.int64()),
        pa.field("dc_mean", pa.float64()),
    ]
)


def audio_dc_offset(clips: DataFrame, suspect_frac: float = 0.02) -> DataFrame:
    """Per-clip DC-bias QA: ``dc_mean`` (mean sample value, full scale
    32768), ``dc_frac`` (= dc_mean/32768) and ``dc_suspect``
    (|dc_frac| > ``suspect_frac``, default 2% of full scale — the usual
    mastering tolerance). A DC-biased upload (asymmetric preamp, bad
    ADC coupling) halves usable headroom and poisons every downstream
    energy/VAD/FFT stat, yet is invisible to peak/RMS checks because the
    bias hides inside the RMS; this is the third leg of the ingest QA
    trio next to loudness (audio_loudness_stats) and frequency content
    (audio_spectral_features).

    One Arrow pass; only the decode-requiring scalar (the mean) crosses
    the UDF boundary — the normalized fraction and the policy flag are
    native Column algebra so ``suspect_frac`` never forces a re-decode.
    Reference seam: Baskerville has no audio-signal operators (its
    features are request-set statistics, features/feature_*.py); this is
    a from-scratch extension for the audio graft cell, gated analytically
    (q131: square-wave clips around a known bias, exact closed-form mean).
    """
    _require_cols(clips, ("clip_id", "bytes", "codec"))

    def _dc(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            payloads = b.column(b.schema.get_field_index("bytes"))
            codecs = b.column(b.schema.get_field_index("codec")).to_pylist()
            clip_ids = b.column(b.schema.get_field_index("clip_id")).to_pylist()
            part_ids = _opt_part_ids(b)
            n = len(b)
            oks = [False] * n
            n_samps: list[int | None] = [None] * n
            means: list[float | None] = [None] * n
            for i in range(n):
                pv = payloads[i]
                payload = pv.as_py() if pv.is_valid else None
                pcm = audio.decode(payload, codecs[i]) if payload is not None else None
                if pcm is None or len(pcm) == 0:
                    continue
                oks[i] = True
                n_samps[i] = int(len(pcm))
                means[i] = float(pcm.astype(np.float64).mean())
            yield pa.RecordBatch.from_arrays(
                [
                    part_ids,
                    pa.array(clip_ids, pa.string()),
                    pa.array(oks, pa.bool_()),
                    pa.array(n_samps, pa.int64()),
                    pa.array(means, pa.float64()),
                ],
                schema=_ARROW_DC,
            )

    cols = [c for c in ("part_id", "clip_id", "bytes", "codec") if c in clips.columns]
    out = clips.select(*cols).mapInArrow(_dc, schema=DC_SCHEMA)
    dc_frac = F.col("dc_mean") / F.lit(FULL_SCALE)
    return out.withColumn("dc_frac", dc_frac).withColumn(
        "dc_suspect", F.abs(F.col("dc_frac")) > F.lit(float(suspect_frac))
    )


def audio_resample(clips: DataFrame, target_sr: int) -> DataFrame:
    """Resample payloads to ``target_sr`` by linear interpolation over the
    new time grid (new_n = n·target/orig, floor) in one Arrow pass,
    re-encoding under each row's codec and updating ``sr_hz``.

    HONEST DSP NOTE: linear interpolation with no anti-alias low-pass —
    content above the new Nyquist aliases, exactly like naive decimation.
    Real pipelines put soxr/librosa behind this seam (absent in this
    container); the op's Spark shape (decode→transform→encode in one
    mapInArrow, payloads never crossing a shuffle) is what's being built
    and gated. Integer downsample ratios are EXACT (the grid hits original
    samples), which is what the q85 gate exploits.
    """
    if "sr_hz" not in clips.columns:
        # without this, a missing sr_hz column silently dropped EVERY row —
        # a schema mistake read as "no data" (round-4 advisor finding).
        # Silent drops remain only for genuinely undecodable/NULL-rate rows.
        raise ValueError(
            "audio_resample requires an 'sr_hz' column "
            f"(got columns {clips.columns})"
        )

    def _res(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            tbl = b.to_pydict()
            keep, new_payloads, new_srs = [], [], []
            for i in range(len(b)):
                payload, codec = tbl["bytes"][i], tbl["codec"][i]
                sr = tbl.get("sr_hz", [None] * len(b))[i]
                pcm = audio.decode(payload, codec) if payload is not None else None
                if pcm is None or len(pcm) == 0 or not sr or sr <= 0:
                    continue
                n = len(pcm)
                new_n = (n * target_sr) // int(sr)
                if new_n <= 0:
                    continue
                src_t = np.arange(n, dtype=np.float64)
                dst_t = np.arange(new_n, dtype=np.float64) * (int(sr) / target_sr)
                res = np.interp(dst_t, src_t, pcm.astype(np.float64))
                out_pcm = np.clip(np.rint(res), -32768, 32767).astype(np.int16)
                keep.append(i)
                new_payloads.append(audio.encode(out_pcm, codec))
                new_srs.append(target_sr)
            out = {
                name: [tbl[name][i] for i in keep]
                for name in tbl
                if name not in ("bytes", "sr_hz")
            }
            out["bytes"] = new_payloads
            if "sr_hz" in tbl:
                out["sr_hz"] = new_srs
            yield pa.RecordBatch.from_pydict(
                {f.name: out[f.name] for f in b.schema}, schema=b.schema
            )

    return clips.mapInArrow(_res, schema=clips.schema)


def audio_downmix(clips: DataFrame, n_channels: int = 2) -> DataFrame:
    """Downmix interleaved multi-channel PCM to mono (per-frame mean,
    round-half-even) in one decode→transform→encode Arrow pass, preserving
    metadata. A trailing partial frame (stream length not divisible by the
    channel count) is truncated — the standard tolerant-reader behavior
    for corrupt interleaving. Rows that fail to decode are dropped.

    Channel count rides in as a parameter because the clip schema
    (BASELINE input_hint) is mono — this is the ingest-side normalizer
    that FEEDS that schema from multi-channel masters.
    """

    def _mix(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            tbl = b.to_pydict()
            keep, new_payloads = [], []
            for i in range(len(b)):
                payload, codec = tbl["bytes"][i], tbl["codec"][i]
                pcm = audio.decode(payload, codec) if payload is not None else None
                if pcm is None or len(pcm) < n_channels:
                    continue
                frames = len(pcm) // n_channels
                x = pcm[: frames * n_channels].astype(np.float64)
                mono = np.rint(x.reshape(frames, n_channels).mean(axis=1))
                out_pcm = np.clip(mono, -32768, 32767).astype(np.int16)
                keep.append(i)
                new_payloads.append(audio.encode(out_pcm, codec))
            out = {
                name: [tbl[name][i] for i in keep] for name in tbl if name != "bytes"
            }
            out["bytes"] = new_payloads
            yield pa.RecordBatch.from_pydict(
                {f.name: out[f.name] for f in b.schema}, schema=b.schema
            )

    return clips.mapInArrow(_mix, schema=clips.schema)


def audio_trim_silence(clips: DataFrame, threshold: int = 100) -> DataFrame:
    """Strip leading/trailing samples with |x| <= ``threshold`` (the
    classic pre-ASR silence trim) in one decode→slice→encode Arrow pass.
    All-silent clips are dropped (nothing left to keep). Interior silence
    is untouched — this is an endpoint trim, not a VAD."""

    def _trim(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            tbl = b.to_pydict()
            keep, new_payloads = [], []
            for i in range(len(b)):
                payload, codec = tbl["bytes"][i], tbl["codec"][i]
                pcm = audio.decode(payload, codec) if payload is not None else None
                if pcm is None or len(pcm) == 0:
                    continue
                loud = np.flatnonzero(np.abs(pcm.astype(np.int32)) > threshold)
                if len(loud) == 0:
                    continue
                trimmed = pcm[loud[0]: loud[-1] + 1]
                keep.append(i)
                new_payloads.append(audio.encode(trimmed, codec))
            out = {
                name: [tbl[name][i] for i in keep] for name in tbl if name != "bytes"
            }
            out["bytes"] = new_payloads
            yield pa.RecordBatch.from_pydict(
                {f.name: out[f.name] for f in b.schema}, schema=b.schema
            )

    return clips.mapInArrow(_trim, schema=clips.schema)


def audio_normalize(clips: DataFrame, target_peak: int = 20000) -> DataFrame:
    """Peak-normalize each payload to ``target_peak`` (gain staging before
    training): decode -> gain = target/peak -> round -> clip -> re-encode,
    one Arrow pass, schema preserved. All-silent clips (peak 0) are dropped
    — there is no gain that normalizes silence. Peaks already at target are
    re-encoded unchanged (gain 1.0 rounds to identity).

    float64 gain keeps the round-trip exact where it matters: for any
    sample at the old peak the output is exactly ``target_peak`` (relative
    double error ~1e-12 « the 0.5 rounding window) — which is what the
    q90 gate pins through the real decode→scale→encode pipeline.
    """

    def _norm(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            tbl = b.to_pydict()
            keep, new_payloads = [], []
            for i in range(len(b)):
                payload, codec = tbl["bytes"][i], tbl["codec"][i]
                pcm = audio.decode(payload, codec) if payload is not None else None
                if pcm is None or len(pcm) == 0:
                    continue
                peak = int(np.abs(pcm.astype(np.int32)).max())
                if peak == 0:
                    continue
                gain = float(target_peak) / peak
                out_pcm = np.clip(
                    np.rint(pcm.astype(np.float64) * gain), -32768, 32767
                ).astype(np.int16)
                keep.append(i)
                new_payloads.append(audio.encode(out_pcm, codec))
            out = {
                name: [tbl[name][i] for i in keep] for name in tbl if name != "bytes"
            }
            out["bytes"] = new_payloads
            yield pa.RecordBatch.from_pydict(
                {f.name: out[f.name] for f in b.schema}, schema=b.schema
            )

    return clips.mapInArrow(_norm, schema=clips.schema)


def audio_overlay(clips: DataFrame, overlays: DataFrame) -> DataFrame:
    """Mix two payload tables sample-wise by ``clip_id`` (noise overlay /
    data augmentation): inner-join, then one Arrow pass doing
    decode(a) + decode(b) over the common prefix (min length), saturating
    to int16, re-encoded under the base row's codec. Base metadata columns
    are preserved; rows where either side fails to decode are dropped.

    Scale shape: this is the one audio op where payloads legitimately meet
    a join. Both sides hash-partition on clip_id — the payload shuffle is
    unavoidable for arbitrary layouts, and disappears entirely when both
    tables are bucketed / Iceberg-storage-partitioned on clip_id (the
    design layout at 10^12 rows); the mix itself is map-side after the
    join, same as every other decode pass.
    """
    base = clips.withColumnRenamed("bytes", "__bytes_a")
    # the overlay's OWN codec rides through the join: decoding the overlay
    # payload with the base row's codec mis-reads mixed-codec pairs (pcm
    # base + flac overlay) into garbage with no error — round-4 advisor
    # finding. Overlay tables without a codec column inherit the base's.
    over = overlays.select(
        F.col("clip_id"),
        F.col("bytes").alias("__bytes_b"),
        (
            F.col("codec") if "codec" in overlays.columns
            else F.lit(None).cast("string")
        ).alias("__codec_b"),
    )
    joined = base.join(over, "clip_id")

    def _mix(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            tbl = b.to_pydict()
            keep, new_payloads = [], []
            for i in range(len(b)):
                codec = tbl["codec"][i]
                codec_b = tbl["__codec_b"][i] or codec
                pa_bytes, pb_bytes = tbl["__bytes_a"][i], tbl["__bytes_b"][i]
                xa = audio.decode(pa_bytes, codec) if pa_bytes is not None else None
                xb = audio.decode(pb_bytes, codec_b) if pb_bytes is not None else None
                if xa is None or xb is None or len(xa) == 0 or len(xb) == 0:
                    continue
                n = min(len(xa), len(xb))
                mixed = np.clip(
                    xa[:n].astype(np.int32) + xb[:n].astype(np.int32),
                    -32768,
                    32767,
                ).astype(np.int16)
                keep.append(i)
                new_payloads.append(audio.encode(mixed, codec))
            out = {
                name: [tbl[name][i] for i in keep]
                for name in tbl
                if name not in ("__bytes_a", "__bytes_b", "__codec_b")
            }
            out["bytes"] = new_payloads
            out_schema = pa.schema(
                [f for f in b.schema
                 if f.name not in ("__bytes_a", "__bytes_b", "__codec_b")]
                + [pa.field("bytes", pa.binary())]
            )
            yield pa.RecordBatch.from_pydict(
                {f.name: out[f.name] for f in out_schema}, schema=out_schema
            )

    out_fields = [
        f for f in joined.schema.fields
        if f.name not in ("__bytes_a", "__bytes_b", "__codec_b")
    ]
    out_schema = T.StructType(out_fields + [T.StructField("bytes", T.BinaryType(), True)])
    return joined.mapInArrow(_mix, schema=out_schema)


PITCH_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.IntegerType(), True),
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("period_samples", T.IntegerType(), True),
    ]
)

_ARROW_PITCH = pa.schema(
    [
        pa.field("part_id", pa.int32()),
        pa.field("clip_id", pa.string()),
        pa.field("decode_ok", pa.bool_()),
        pa.field("period_samples", pa.int32()),
    ]
)


def audio_pitch_period(
    clips: DataFrame, min_lag: int = 2, max_lag: int = 64, window: int = 512
) -> DataFrame:
    """Fundamental-period estimate per clip: exact int64 autocorrelation
    over the first ``window`` samples, argmax lag in [min_lag, max_lag]
    (ties -> smallest lag, i.e. the fundamental, not a harmonic multiple).
    The screen for mislabeled sample rates and tone-like junk uploads.

    Cost is O(window * max_lag) integer MACs per clip — constant per row,
    independent of clip length; at scale the FFT form (O(W log W) via
    rfft->|.|^2->irfft) is the drop-in when max_lag grows, same
    decode-once Arrow pass either way. int64 exactness is what lets the
    q92 gate pin the argmax against the planted square-wave period.
    """

    def _pitch(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            payloads = b.column(b.schema.get_field_index("bytes"))
            codecs = b.column(b.schema.get_field_index("codec")).to_pylist()
            clip_ids = b.column(b.schema.get_field_index("clip_id")).to_pylist()
            part_ids = _opt_part_ids(b)
            n = len(b)
            oks = [False] * n
            periods: list[int | None] = [None] * n
            for i in range(n):
                pv = payloads[i]
                payload = pv.as_py() if pv.is_valid else None
                pcm = audio.decode(payload, codecs[i]) if payload is not None else None
                if pcm is None or len(pcm) <= min_lag:
                    continue
                oks[i] = True
                x = pcm[:window].astype(np.int64)
                hi = min(max_lag, len(x) - 1)
                best_lag, best_r = None, None
                for lag in range(min_lag, hi + 1):
                    r = int(np.dot(x[:-lag], x[lag:]))
                    if best_r is None or r > best_r:
                        best_r, best_lag = r, lag
                periods[i] = best_lag
            yield pa.RecordBatch.from_arrays(
                [
                    part_ids,
                    pa.array(clip_ids, pa.string()),
                    pa.array(oks, pa.bool_()),
                    pa.array(periods, pa.int32()),
                ],
                schema=_ARROW_PITCH,
            )

    _require_cols(clips, ("clip_id", "bytes", "codec"))
    cols = [c for c in ("part_id", "clip_id", "bytes", "codec") if c in clips.columns]
    return clips.select(*cols).mapInArrow(_pitch, schema=PITCH_SCHEMA)


SEGMENT_SCHEMA_SUFFIX = [
    T.StructField("seg_idx", T.IntegerType(), False),
    T.StructField("n_samples", T.LongType(), False),
]


def _emit_spans(clips: DataFrame, span_fn) -> DataFrame:
    """Shared fan-out machinery for clip-side segmentation ops: decode each
    payload once, let ``span_fn(pcm) -> [(start, end_exclusive), ...]``
    choose the spans, and emit one OUTPUT ROW per span — metadata carried,
    ``seg_idx``/``n_samples`` appended, each span re-encoded under the
    row's codec. Undecodable rows and empty span lists drop. Data-dependent
    fan-out, still a narrow map-side op, no shuffle. ONE copy of the Arrow
    emission scaffolding so segmenters can't diverge on schema/null
    handling."""
    clash = {"seg_idx", "n_samples"} & set(clips.columns)
    if clash:
        # re-segmenting a segmenter's own output would otherwise build an
        # Arrow schema with duplicate field names — failing confusingly or
        # silently clobbering the originals (round-4 advisor finding).
        # Rename/drop the prior segmentation columns first.
        raise ValueError(
            f"input already carries segmentation columns {sorted(clash)}; "
            "rename or drop them before re-segmenting"
        )

    out_schema = T.StructType(clips.schema.fields + SEGMENT_SCHEMA_SUFFIX)

    def _emit(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            tbl = b.to_pydict()
            names = [f.name for f in b.schema]
            rows: dict[str, list] = {n: [] for n in names}
            rows["seg_idx"] = []
            rows["n_samples"] = []
            for i in range(len(b)):
                payload, codec = tbl["bytes"][i], tbl["codec"][i]
                pcm = audio.decode(payload, codec) if payload is not None else None
                if pcm is None or len(pcm) == 0:
                    continue
                for k, (s, e) in enumerate(span_fn(pcm)):
                    seg = pcm[s:e]
                    for n in names:
                        rows[n].append(
                            audio.encode(seg, codec) if n == "bytes" else tbl[n][i]
                        )
                    rows["seg_idx"].append(k)
                    rows["n_samples"].append(len(seg))
            schema = pa.schema(
                list(b.schema)
                + [pa.field("seg_idx", pa.int32()), pa.field("n_samples", pa.int64())]
            )
            yield pa.RecordBatch.from_pydict(
                {f.name: rows[f.name] for f in schema}, schema=schema
            )

    return clips.mapInArrow(_emit, schema=out_schema)


def audio_segment(clips: DataFrame, segment_samples: int) -> DataFrame:
    """Split each payload into fixed-length sample windows, one OUTPUT ROW
    per segment (clip-side chunking, the audio analog of
    packing.chunk_documents): all metadata columns are carried, plus
    ``seg_idx`` and the segment's ``n_samples`` (the last segment may be
    short). One decode pass; segments re-encode under the row's codec.
    Fan-out is data-dependent (ceil(n/segment)) — still a narrow map-side
    op, no shuffle."""

    def spans(pcm):
        return [
            (s, min(s + segment_samples, len(pcm)))
            for s in range(0, len(pcm), segment_samples)
        ]

    return _emit_spans(clips, spans)


def audio_split_on_silence(
    clips: DataFrame, threshold: int = 100, min_gap: int = 64
) -> DataFrame:
    """Interior silence splitting (VAD-style utterance segmentation, the
    step past audio_trim_silence): endpoints are trimmed, then the clip
    splits at every interior silence run of >= ``min_gap`` samples;
    shorter interior pauses stay inside their segment. One output row per
    voiced segment (seg_idx, n_samples appended, payload re-encoded under
    the row's codec); all-silent clips drop. Same decode-once, map-side,
    data-dependent-fan-out shape as audio_segment."""

    def spans(pcm):
        voiced = np.flatnonzero(np.abs(pcm.astype(np.int32)) > threshold)
        if len(voiced) == 0:
            return []
        # split between consecutive voiced samples separated by a
        # qualifying silence run; segments span voiced-to-voiced
        gaps = np.flatnonzero(np.diff(voiced) - 1 >= min_gap)
        starts = np.concatenate([[0], gaps + 1])
        ends = np.concatenate([gaps, [len(voiced) - 1]])
        return [
            (int(voiced[a]), int(voiced[b]) + 1) for a, b in zip(starts, ends)
        ]

    return _emit_spans(clips, spans)


def audio_concat_segments(segs: DataFrame) -> DataFrame:
    """Reassemble segmented clips (the inverse of audio_segment /
    audio_split_on_silence, and the training-time concat step): group by
    clip_id, order by seg_idx, decode each piece, concatenate, re-encode
    under the group's codec. The one audio op with a GROUPED payload
    shuffle — segments of a clip must meet — expressed as applyInPandas so
    each group is reassembled vectorized in one worker call; output is one
    row per clip. At 10^12 scale the shuffle carries exactly the payload
    bytes once (no amplification), and clips segmented by the same job are
    usually still partition-local (same input split), so AQE sees a
    near-no-op exchange."""
    import pandas as pd

    meta_cols = [
        c for c in segs.columns if c not in ("bytes", "seg_idx", "n_samples")
    ]
    out_schema = T.StructType(
        [f for f in segs.schema.fields if f.name in meta_cols]
        + [
            T.StructField("bytes", T.BinaryType(), True),
            T.StructField("n_samples", T.LongType(), False),
        ]
    )

    def _concat(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seg_idx")
        codec = pdf["codec"].iloc[0]
        pieces = [
            audio.decode(bz, codec) for bz in pdf["bytes"] if bz is not None
        ]
        pieces = [p for p in pieces if p is not None]
        if not pieces:
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        whole = np.concatenate(pieces)
        row = {c: [pdf[c].iloc[0]] for c in meta_cols}
        row["bytes"] = [audio.encode(whole, codec)]
        row["n_samples"] = [len(whole)]
        return pd.DataFrame(row)

    return segs.groupBy("clip_id").applyInPandas(_concat, schema=out_schema)


BANDWIDTH_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("rolloff_bin", T.IntegerType(), True),
        T.StructField("band_frac", T.DoubleType(), True),
    ]
)

_ARROW_BW = pa.schema(
    [
        pa.field("clip_id", pa.string()),
        pa.field("decode_ok", pa.bool_()),
        pa.field("rolloff_bin", pa.int32()),
        pa.field("band_frac", pa.float64()),
    ]
)


def audio_bandwidth(
    clips: DataFrame, n_fft: int = 256, energy_frac: float = 0.99
) -> DataFrame:
    """Spectral rolloff per clip: the smallest rFFT bin (DC excluded) whose
    cumulative energy reaches ``energy_frac`` of the total, over the first
    ``n_fft`` samples (zero-padded). ``band_frac`` = rolloff/(n_fft/2) —
    occupied fraction of the declared band.

    The band-limit QA screen the spectral-features op doesn't give
    (dominant_bin sees the loudest component; rolloff sees where the
    energy STOPS): an 8 kHz recording upsampled and mislabeled 16 kHz
    rolls off at ~half the declared Nyquist, lowpass-transcoded junk rolls
    off early, genuine full-band content reaches the top bins. Same shape
    as every decode op: one Arrow pass, one O(n_fft log n_fft) rFFT per
    clip, narrow rows out; threshold/verdict joins stay Column algebra
    downstream. Silent clips keep NULL rolloff (no energy to place).
    """
    _require_cols(clips, ("clip_id", "bytes", "codec"))
    half = n_fft // 2

    def _bw(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            payloads = b.column(b.schema.get_field_index("bytes"))
            codecs = b.column(b.schema.get_field_index("codec")).to_pylist()
            clip_ids = b.column(b.schema.get_field_index("clip_id")).to_pylist()
            n = len(b)
            oks = [False] * n
            roll: list[int | None] = [None] * n
            frac: list[float | None] = [None] * n
            for i in range(n):
                pv = payloads[i]
                payload = pv.as_py() if pv.is_valid else None
                pcm = audio.decode(payload, codecs[i]) if payload is not None else None
                if pcm is None or len(pcm) == 0:
                    continue
                oks[i] = True
                x = pcm[:n_fft].astype(np.float64)
                if len(x) < n_fft:
                    x = np.concatenate([x, np.zeros(n_fft - len(x))])
                e = np.abs(np.fft.rfft(x)[1:]) ** 2  # DC excluded
                total = e.sum()
                if total <= 0:
                    continue  # silent: rolloff stays NULL
                j = int(np.searchsorted(np.cumsum(e), energy_frac * total)) + 1
                roll[i] = j
                frac[i] = j / half
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(clip_ids, pa.string()),
                    pa.array(oks, pa.bool_()),
                    pa.array(roll, pa.int32()),
                    pa.array(frac, pa.float64()),
                ],
                schema=_ARROW_BW,
            )

    cols = [c for c in ("clip_id", "bytes", "codec") if c in clips.columns]
    return clips.select(*cols).mapInArrow(_bw, schema=BANDWIDTH_SCHEMA)


VAD_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("n_utterances", T.IntegerType(), True),
        T.StructField("speech_samples", T.LongType(), True),
        T.StructField("speech_frac", T.DoubleType(), True),
        T.StructField("longest_gap", T.LongType(), True),
    ]
)

_ARROW_VAD = pa.schema(
    [
        pa.field("clip_id", pa.string()),
        pa.field("decode_ok", pa.bool_()),
        pa.field("n_samples", pa.int64()),
        pa.field("n_utterances", pa.int32()),
        pa.field("speech_samples", pa.int64()),
        pa.field("speech_frac", pa.float64()),
        pa.field("longest_gap", pa.int64()),
    ]
)


def audio_vad_stats(
    clips: DataFrame, threshold: int = 100, min_gap: int = 64
) -> DataFrame:
    """Per-clip VAD summary — the sampling/QA metrics WITHOUT the
    segmentation fan-out: utterance count, speech sample count/fraction,
    and the longest interior silence run. Semantics exactly shared with
    :func:`audio_split_on_silence` (voiced = |x| > threshold; utterances
    split at interior silence >= min_gap; an utterance span runs
    voiced-to-voiced, so sub-min_gap pauses count as speech) — the
    summary a corpus curator filters/samples on (speech_frac < 0.3 =
    mostly silence; n_utterances = dialogue density) before paying the
    per-segment row explosion. One decode pass, one narrow row per clip;
    all-silent clips report zeros rather than dropping (unlike the
    splitter, a summary must account for every clip).
    """

    def _vad(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            payloads = b.column(b.schema.get_field_index("bytes"))
            codecs = b.column(b.schema.get_field_index("codec")).to_pylist()
            clip_ids = b.column(b.schema.get_field_index("clip_id")).to_pylist()
            n = len(b)
            oks = [False] * n
            ns: list[int | None] = [None] * n
            utts: list[int | None] = [None] * n
            speech: list[int | None] = [None] * n
            frac: list[float | None] = [None] * n
            gap: list[int | None] = [None] * n
            for i in range(n):
                pv = payloads[i]
                payload = pv.as_py() if pv.is_valid else None
                pcm = audio.decode(payload, codecs[i]) if payload is not None else None
                if pcm is None or len(pcm) == 0:
                    continue
                oks[i] = True
                ns[i] = len(pcm)
                voiced = np.flatnonzero(np.abs(pcm.astype(np.int32)) > threshold)
                if len(voiced) == 0:
                    utts[i], speech[i], frac[i], gap[i] = 0, 0, 0.0, 0
                    continue
                runs = np.diff(voiced) - 1          # interior silence lengths
                gap[i] = int(runs.max()) if len(runs) else 0
                cuts = np.flatnonzero(runs >= min_gap)
                starts = np.concatenate([[0], cuts + 1])
                ends = np.concatenate([cuts, [len(voiced) - 1]])
                utts[i] = len(starts)
                speech[i] = int(
                    sum(voiced[b_] - voiced[a_] + 1 for a_, b_ in zip(starts, ends))
                )
                frac[i] = speech[i] / ns[i]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(clip_ids, pa.string()),
                    pa.array(oks, pa.bool_()),
                    pa.array(ns, pa.int64()),
                    pa.array(utts, pa.int32()),
                    pa.array(speech, pa.int64()),
                    pa.array(frac, pa.float64()),
                    pa.array(gap, pa.int64()),
                ],
                schema=_ARROW_VAD,
            )

    _require_cols(clips, ("clip_id", "bytes", "codec"))
    cols = [c for c in ("clip_id", "bytes", "codec") if c in clips.columns]
    return clips.select(*cols).mapInArrow(_vad, schema=VAD_SCHEMA)


BALANCE_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.IntegerType(), True),
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("rms_l_dbfs", T.DoubleType(), True),
        T.StructField("rms_r_dbfs", T.DoubleType(), True),
        T.StructField("balance_db", T.DoubleType(), True),
        T.StructField("corr_lr", T.DoubleType(), True),
    ]
)

_ARROW_BAL = pa.schema(
    [
        pa.field("part_id", pa.int32()),
        pa.field("clip_id", pa.string()),
        pa.field("decode_ok", pa.bool_()),
        pa.field("n_frames", pa.int64()),
        pa.field("rms_l_dbfs", pa.float64()),
        pa.field("rms_r_dbfs", pa.float64()),
        pa.field("balance_db", pa.float64()),
        pa.field("corr_lr", pa.float64()),
    ]
)


def audio_channel_balance(clips: DataFrame, n_channels: int = 2) -> DataFrame:
    """Stereo QA over interleaved multi-channel payloads: per-clip L/R RMS
    (dBFS), ``balance_db`` (= rms_l_dbfs − rms_r_dbfs) and ``corr_lr``
    (Pearson correlation of the first two channels). The stereo-ingest
    failure screen mono stats can't see: a dead/near-dead channel
    (balance_db blows up, rms NULL when silent), a polarity flip
    (corr ≈ −1), and fake stereo (mono duplicated into both channels,
    corr ≈ +1 with balance ≈ 0). Channels beyond the first two are
    ignored for the pair metrics; a trailing partial frame is truncated
    (same tolerant-reader rule as audio_downmix). Silent channels emit
    NULL dBFS (never −inf); zero-variance channels emit NULL corr (the
    statistic is undefined, not 0).

    One Arrow decode pass, narrow rows out. Reference seam: Baskerville
    has no audio-signal operators; from-scratch for the audio graft cell,
    gated analytically (q134: ±square-wave channel pairs whose RMS,
    balance and correlation are exact closed forms).
    """
    _require_cols(clips, ("clip_id", "bytes", "codec"))
    if n_channels < 2:
        # fail at call time, not as an opaque IndexError inside the Arrow
        # worker on the first decodable clip (x[:, 1] needs two channels)
        raise ValueError(
            f"audio_channel_balance needs n_channels >= 2, got {n_channels}"
        )

    def _bal(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            payloads = b.column(b.schema.get_field_index("bytes"))
            codecs = b.column(b.schema.get_field_index("codec")).to_pylist()
            clip_ids = b.column(b.schema.get_field_index("clip_id")).to_pylist()
            part_ids = _opt_part_ids(b)
            n = len(b)
            oks = [False] * n
            frames: list[int | None] = [None] * n
            rls: list[float | None] = [None] * n
            rrs: list[float | None] = [None] * n
            bals: list[float | None] = [None] * n
            corrs: list[float | None] = [None] * n
            for i in range(n):
                pv = payloads[i]
                payload = pv.as_py() if pv.is_valid else None
                pcm = audio.decode(payload, codecs[i]) if payload is not None else None
                if pcm is None or len(pcm) < n_channels:
                    continue
                oks[i] = True
                nf = len(pcm) // n_channels
                x = pcm[: nf * n_channels].astype(np.float64).reshape(nf, n_channels)
                left, right = x[:, 0], x[:, 1]
                frames[i] = int(nf)
                rms_l = float(np.sqrt((left * left).mean()))
                rms_r = float(np.sqrt((right * right).mean()))
                db_l = 20.0 * np.log10(rms_l / FULL_SCALE) if rms_l > 0 else None
                db_r = 20.0 * np.log10(rms_r / FULL_SCALE) if rms_r > 0 else None
                rls[i], rrs[i] = db_l, db_r
                if db_l is not None and db_r is not None:
                    bals[i] = db_l - db_r
                lc, rc = left - left.mean(), right - right.mean()
                den = float(np.sqrt((lc * lc).sum() * (rc * rc).sum()))
                if den > 0:
                    corrs[i] = float((lc * rc).sum() / den)
            yield pa.RecordBatch.from_arrays(
                [
                    part_ids,
                    pa.array(clip_ids, pa.string()),
                    pa.array(oks, pa.bool_()),
                    pa.array(frames, pa.int64()),
                    pa.array(rls, pa.float64()),
                    pa.array(rrs, pa.float64()),
                    pa.array(bals, pa.float64()),
                    pa.array(corrs, pa.float64()),
                ],
                schema=_ARROW_BAL,
            )

    cols = [c for c in ("part_id", "clip_id", "bytes", "codec") if c in clips.columns]
    return clips.select(*cols).mapInArrow(_bal, schema=BALANCE_SCHEMA)
