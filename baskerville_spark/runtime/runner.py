"""Validation runner: composes all checks into verdicts + violations + stats.

Query-lifecycle parity with the reference's fixed step DAG
``preprocessing → group_by → feature_calculation → label_or_predict → save``
(src/baskerville/models/base_spark.py:82-97) re-expressed as declarative
DataFrame plans:

  schema-enforce → [stats agg | uniqueness agg | RI anti-join |
                    drift agg | audio-invariant mapInPandas] → verdicts/violations

Scale design (100 TB):
- ONE payload-free projection of the fact table is materialized and feeds
  every metadata check (stats/uniqueness/RI/pattern/drift); only the audio
  invariant scans ``bytes``. Column pruning alone is NOT enough when blobs
  are colocated in the same files — the pruned scan still seeks around the
  blob chunks (measured 6x slower than a slim table) — so paying one such
  pass instead of five is the dominant win. The projection is a few % of
  table size; on a cluster it persists MEMORY_AND_DISK or lands in a temp
  table.
- There is exactly one shuffle per aggregate check, keyed on part_id (or
  (part_id, clip_id) for uniqueness), with map-side partial aggregation.
- Verdict/violation outputs are tiny relative to input; unions of them are
  cheap.
- Resume: partition pruning via a ``part_id IN (pending)`` predicate — with
  parquet `partitionBy(part_id)` layout (or Iceberg partition specs) the
  done partitions are never read at all.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timezone

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from baskerville_spark.checks import drift as drift_mod
from baskerville_spark.checks import invariants as inv_mod
from baskerville_spark.checks import referential, stats, uniqueness
from baskerville_spark.checks.schema_check import ColumnSpec, pattern_violations
from baskerville_spark.runtime import manifest as manifest_mod

#: Schema spec for the clip table: the enforced version of the reference's
#: declared-but-unenforced log schema (data/samples/log_schema.json).
CLIP_SPECS = [
    ColumnSpec("clip_id", "string", required=True, drop_if_missing=True,
               pattern=r"^clip_[0-9]{12}$"),
    ColumnSpec("codec", "string", pattern=r"^(pcm_s16le|flac|opus)$"),
    ColumnSpec("sr_hz", "int"),
    ColumnSpec("dur_ms", "int"),
    ColumnSpec("transcript", "string"),
]


@dataclass(frozen=True)
class ValidationConfig:
    null_rate_max: float = 0.05
    range_bounds: dict = field(
        default_factory=lambda: {"dur_ms": (1.0, 30000.0), "sr_hz": (8000.0, 48000.0)}
    )
    psi_threshold: float = drift_mod.PSI_THRESHOLD
    ks_threshold: float = drift_mod.KS_THRESHOLD
    n_salt: int = 64
    ri_strategy: str = "auto"
    snr_violation_rate_max: float = 0.0   # any SNR failure fails the partition
    check_audio: bool = True
    numeric_cols: tuple = ("sr_hz", "dur_ms")
    categorical_cols: tuple = ("codec",)
    # metadata-consistency checks (checks/consistency.py); off by default so
    # existing verdict grids (and their closed-form oracles) are unchanged
    check_payload_bytes: bool = False
    check_speaking_rate: bool = False
    speaking_rate_bounds: tuple = (0.5, 30.0)
    # mergeable per-partition state rows (checks/stats_state.py): written to
    # {out_dir}/states so table-level stats fold from tiny state rows
    # instead of rescanning settled partitions. Off by default — existing
    # verdict grids and sink layouts are unchanged.
    emit_states: bool = False
    state_distinct_cols: tuple = ("clip_id",)
    state_hist_edges: dict = field(default_factory=dict)  # col -> bin edges
    # per-partition chi-squared homogeneity of each categorical column's
    # mix vs the REST of the table (checks/drift.chi2_homogeneity) —
    # judged on Cramér's V (scale-free effect size: raw chi2 is always
    # "significant" at 10^12 rows), verdict rows chi2:<col>. Off by
    # default so existing verdict grids/oracles are unchanged.
    check_categorical_mix: bool = False
    # 0.2 = "medium effect" (same convention as PSI_THRESHOLD); note a hot
    # drifted partition also contaminates every clean partition's
    # complement, lifting their V — the threshold must clear that floor
    cramers_v_max: float = 0.2
    # additive decode-QA states (checks/audio_state.py) to {out}/audio_states
    # — one decode pass per ingest batch, settled clips never re-decoded.
    # Requires check_audio-capable input (a bytes column).
    emit_audio_states: bool = False
    # user-declared constraint suite (checks/suite.py Constraints — e.g.
    # parsed from JSON config via suite_from_json): compiled into ONE extra
    # aggregation pass over the SAME persisted payload-free projection and
    # unioned into the verdict grid as suite:<name> rows. Constraints may
    # reference only metadata columns (part_id, clip_id, sr_hz, dur_ms,
    # codec, transcript) — a payload reference fails resolution loudly.
    extra_suite: tuple = ()


@dataclass
class ValidationResult:
    verdicts: DataFrame
    violations: DataFrame
    stats: DataFrame
    states: DataFrame | None = None
    audio_states: DataFrame | None = None
    persisted: list = field(default_factory=list)

    def unpersist(self) -> None:
        """Release every DataFrame run_validation persisted. Call after the
        outputs are materialized — long-lived sessions (bench loops, the
        driver harness) otherwise accumulate cached blocks until executor
        storage memory is exhausted."""
        for df in self.persisted:
            df.unpersist()
        self.persisted.clear()


def _violation_verdicts(
    violations: DataFrame, part_rows: DataFrame, check_names: list[str]
) -> DataFrame:
    """(part × check) grid left-joined with violation counts → pass/fail rows.

    The cross join is parts × checks — a few dozen rows; broadcast by AQE.
    """
    spark = violations.sparkSession
    checks_df = spark.createDataFrame(
        [Row(check_name=c) for c in check_names]
    )
    grid = part_rows.crossJoin(F.broadcast(checks_df))
    counts = violations.groupBy("part_id", "check_name").agg(
        F.count(F.lit(1)).alias("n_violations")
    )
    return (
        grid.join(counts, ["part_id", "check_name"], "left")
        .select(
            F.col("part_id").cast("int").alias("part_id"),
            "check_name",
            (F.coalesce(F.col("n_violations"), F.lit(0)) == 0).alias("passed"),
            (
                F.coalesce(F.col("n_violations"), F.lit(0))
                / F.greatest(F.col("n_rows"), F.lit(1))
            ).cast("double").alias("metric_value"),
            F.lit(0.0).alias("threshold"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.coalesce(F.col("n_violations"), F.lit(0)).cast("long").alias("n_violations"),
        )
    )


def run_validation(
    spark: SparkSession,
    clips: DataFrame,
    transcript_ref: DataFrame | None = None,
    baseline_rows: list[Row] | None = None,
    cfg: ValidationConfig | None = None,
    persist_intermediate: bool = True,
) -> ValidationResult:
    """Build the verdict / violation / stats plans for the clip table.

    ``persist_intermediate`` caches the NARROW check outputs (violation rows,
    invariant results — tiny relative to input) so materializing verdicts and
    violations does not re-run the expensive scans (in particular the audio
    decode). At cluster scale the equivalent is writing these intermediates
    to the results table and reading back — same O(output) cost.
    """
    cfg = cfg or ValidationConfig()
    persisted: list[DataFrame] = []

    # Materialize the payload-free projection ONCE: with audio blobs
    # colocated in the same parquet files, even a pruned metadata scan pays
    # a seek storm per read (measured 6x slower than a slim table, worse
    # with more cores). One slim pass feeds every metadata check; only the
    # audio invariant touches `bytes`. At cluster scale the same projection
    # is a cheap shuffle-free stage whose output is a few % of table size.
    meta_cols = ["part_id", "clip_id", "sr_hz", "dur_ms", "codec", "transcript"]
    slim = clips.select(*[c for c in meta_cols if c in clips.columns])
    if persist_intermediate:
        slim = slim.persist()
        persisted.append(slim)
        slim.count()  # eager fill — see the violations note below

    # --- stats ---
    st = stats.column_stats(
        slim,
        numeric_cols=list(cfg.numeric_cols),
        other_cols=["clip_id", "codec", "transcript"],
    )
    if persist_intermediate:
        st = st.persist()  # tiny (parts × cols); feeds several verdict branches
        persisted.append(st)
        # eager fill happens below, CONCURRENTLY with the violations fill
    verdicts = stats.stats_verdicts(st, cfg.null_rate_max, cfg.range_bounds)

    # per-partition row counts derived from stats — no extra scan of the fact
    part_rows = st.where(F.col("column_name") == "clip_id").select(
        "part_id", (F.col("count") + F.col("null_count")).alias("n_rows")
    )

    # --- violation-producing checks ---
    violation_dfs: list[DataFrame] = [
        uniqueness.uniqueness_violations(slim, n_salt=cfg.n_salt),
    ]
    check_names = ["uniqueness"]

    if transcript_ref is not None:
        violation_dfs.append(
            referential.ref_integrity_violations(
                slim, transcript_ref, strategy=cfg.ri_strategy
            )
        )
        check_names.append("ref_integrity")

    pv = pattern_violations(slim, CLIP_SPECS)
    if pv is not None:
        violation_dfs.append(pv)
        check_names += [f"pattern:{s.name}" for s in CLIP_SPECS if s.pattern]

    if cfg.check_speaking_rate:
        from baskerville_spark.checks import consistency

        lo, hi = cfg.speaking_rate_bounds
        sr_v = consistency.speaking_rate_violations(slim, min_cps=lo, max_cps=hi)
        violation_dfs.append(
            sr_v.select(
                "part_id",
                "clip_id",
                "check_name",
                F.concat(
                    F.lit("chars_per_sec="), F.col("chars_per_sec").cast("string")
                ).alias("detail"),
            )
        )
        check_names.append("speaking_rate")

    inv = inv_mod.audio_invariant(clips, transcript_ref) if cfg.check_audio else None
    if inv is not None and cfg.emit_audio_states and persist_intermediate:
        # two consumers of the decode pass (violations + audio states):
        # cache the narrow per-clip rows so audio is decoded exactly once.
        # Eager fill happens below (subtree caches don't reliably populate
        # under AQE), concurrently with the stats fill.
        inv = inv.persist()
        persisted.append(inv)
    if cfg.check_audio:
        violation_dfs.append(inv_mod.invariant_violations(inv))
        check_names += ["snr", "decode_error", "transcript_eq"]

    if cfg.check_payload_bytes:
        from baskerville_spark.checks import consistency

        if inv is not None:
            # byte_len + echoed metadata ride out of the SAME Arrow pass that
            # decodes audio (pc.binary_length on the batch offsets — no extra
            # payload IO, and crucially NO clip_id join back to the metadata:
            # clip_id is not unique, a join would cross-match dup rows)
            meta_bl = inv
        else:
            # no decode pass to piggyback on: pay one dedicated payload scan
            meta_bl = clips.select(
                "part_id", "clip_id", "codec", "sr_hz", "dur_ms",
                F.length("bytes").alias("byte_len"),
            )
        pb = consistency.payload_byte_violations(meta_bl)
        violation_dfs.append(
            pb.select(
                "part_id",
                "clip_id",
                "check_name",
                F.concat(
                    F.lit("byte_len="), F.col("byte_len").cast("string"),
                    F.lit(" expected="), F.col("expected_bytes").cast("string"),
                ).alias("detail"),
            )
        )
        check_names.append("payload_bytes")

    violations = violation_dfs[0]
    for v in violation_dfs[1:]:
        violations = violations.unionByName(v)
    if persist_intermediate:
        # persist AND materialize eagerly: when the cached plan is first
        # executed as a subtree of the much larger verdicts DAG, the cache
        # does not reliably populate (observed under AQE) and every
        # downstream action re-runs the full check scans including the audio
        # decode. One explicit action here fills the cache; every verdict /
        # caller action after it reads O(violations) rows only.
        #
        # The fills run CONCURRENTLY (guide §2.6 — independent jobs
        # back-fill each other's task tails): stats and the decode-bearing
        # frame share only the already-filled slim cache. When the audio
        # states ride the decode pass, `inv` is the decode-bearing frame and
        # the violations fill afterwards reads its cache (decode exactly
        # once); otherwise violations itself carries the decode.
        violations = violations.persist()
        persisted.append(violations)
        from concurrent.futures import ThreadPoolExecutor

        first: list[DataFrame] = [st]
        second: DataFrame | None = None
        if inv is not None and cfg.emit_audio_states:
            first.append(inv)
            second = violations
        else:
            first.append(violations)
        with ThreadPoolExecutor(max_workers=len(first)) as pool:
            list(pool.map(lambda df: df.count(), first))
        if second is not None:
            second.count()

    verdicts = verdicts.unionByName(
        _violation_verdicts(violations, part_rows, check_names)
    )

    # --- drift ---
    if baseline_rows:
        verdicts = verdicts.unionByName(
            drift_mod.drift_verdicts(
                slim, baseline_rows,
                psi_threshold=cfg.psi_threshold, ks_threshold=cfg.ks_threshold,
            )
        )

    # --- per-partition categorical-mix homogeneity (chi2 + Cramér's V) ---
    if cfg.check_categorical_mix:
        for c in cfg.categorical_cols:
            mix = drift_mod.chi2_homogeneity(slim, "part_id", c)
            verdicts = verdicts.unionByName(
                mix.select(
                    F.col("part_id").cast("int").alias("part_id"),
                    F.lit(f"chi2:{c}").alias("check_name"),
                    # single-partition tables (n_rest = 0) have no
                    # complement to test against: undefined, not failed
                    F.coalesce(
                        F.col("cramers_v") <= F.lit(float(cfg.cramers_v_max)),
                        F.lit(True),
                    ).alias("passed"),
                    F.col("cramers_v").cast("double").alias("metric_value"),
                    F.lit(float(cfg.cramers_v_max)).alias("threshold"),
                    F.col("n_group").cast("long").alias("n_rows"),
                    F.lit(None).cast("long").alias("n_violations"),
                )
            )

    # --- user-declared constraint suite (config-driven, e.g. JSON) ---
    if cfg.extra_suite:
        from baskerville_spark.checks import suite as suite_mod

        sv = suite_mod.run_suite(
            slim, list(cfg.extra_suite), group_by=["part_id"]
        )
        verdicts = verdicts.unionByName(
            sv.select(
                F.col("part_id").cast("int").alias("part_id"),
                F.concat(F.lit("suite:"), F.col("check_name")).alias("check_name"),
                "passed",
                "metric_value",
                "threshold",
                "n_rows",
                "n_violations",
            )
        )

    # --- mergeable state rows (fed from the SAME persisted slim pass) ---
    states_df = None
    if cfg.emit_states:
        from baskerville_spark.checks import stats_state as stats_state_mod

        states_df = stats_state_mod.stats_state(
            slim,
            ["part_id"],
            list(cfg.numeric_cols),
            [c for c in cfg.state_distinct_cols if c in slim.columns],
            hist_cols=dict(cfg.state_hist_edges) or None,
        )

    audio_states_df = None
    if cfg.emit_audio_states:
        from baskerville_spark.checks import audio_state as audio_state_mod

        if inv is not None:
            # the invariant decode pass already emits the per-clip state
            # fields — aggregate those instead of paying a second decode
            audio_states_df = audio_state_mod.state_from_per_clip(inv)
        else:
            audio_states_df = audio_state_mod.decode_state(clips)

    return ValidationResult(
        verdicts=verdicts, violations=violations, stats=st,
        states=states_df, audio_states=audio_states_df, persisted=persisted,
    )


def _partition_values(clips: DataFrame) -> set[int] | None:
    """part_id values of a hive-partitioned (``part_id=N`` directory) clip
    table, read from the scan's file list — DRIVER-side metadata the reader
    has already listed, so resume discovery costs no Spark job. None when
    any file is outside that layout (caller falls back to a distinct scan:
    partition values then genuinely live in the data)."""
    import re

    try:
        files = clips.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    out: set[int] = set()
    for f in files:
        m = re.search(r"[/\\]part_id=(-?\d+)[/\\]", f)
        if m is None:
            return None
        out.add(int(m.group(1)))
    return out


def _delete_pending_sink_dirs(
    spark: SparkSession, out_dir: str, sink_names: tuple, pending: list
) -> None:
    """Remove ``{out_dir}/{sink}/part_id={p}`` for every pending partition
    via the Hadoop FileSystem API (portable across file/hdfs/s3a schemes)."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for sink in sink_names:
        for p in pending:
            path = jvm.org.apache.hadoop.fs.Path(f"{out_dir}/{sink}/part_id={int(p)}")
            fs = path.getFileSystem(hconf)
            if fs.exists(path):
                fs.delete(path, True)


def run_resumable(
    spark: SparkSession,
    clips_path: str,
    manifest_path: str,
    out_dir: str,
    transcript_ref_path: str | None = None,
    baseline_path: str | None = None,
    cfg: ValidationConfig | None = None,
) -> list[int]:
    """Resumable run over a partitioned clip table.

    Reads the manifest, prunes finished partitions via a pushed-down
    ``part_id IN (...)`` predicate (partition pruning on the parquet/Iceberg
    layout), validates the rest in ONE Spark job, then commits a manifest
    row per partition. Returns the list of partitions processed this run.
    """
    cfg = cfg or ValidationConfig()
    started = datetime.now(timezone.utc)

    clips = spark.read.parquet(clips_path)
    all_parts = _partition_values(clips)
    if all_parts is None:  # non-partitioned layout: pay the distinct
        all_parts = {
            r["part_id"] for r in clips.select("part_id").distinct().collect()
        }
    done = manifest_mod.done_partitions(spark, manifest_path)
    pending = sorted(all_parts - done)
    if not pending:
        return []

    clips = clips.where(F.col("part_id").isin(pending))
    tref = (
        spark.read.parquet(transcript_ref_path) if transcript_ref_path else None
    )
    baseline_rows = (
        drift_mod.load_baseline(spark, baseline_path) if baseline_path else None
    )

    res = run_validation(spark, clips, tref, baseline_rows, cfg)

    from baskerville_spark.runtime.metrics import observe_violations

    observed, obs = observe_violations(res.violations)
    # Idempotent, fully distributed outputs: partitionBy(part_id) with
    # DYNAMIC partition overwrite, so a partition retried after a crash
    # between these writes and the manifest commit REPLACES its previous
    # files instead of appending duplicate rows. Verdicts never round-trip
    # through the driver — at 10^6 partitions × ~14 checks a collect() in
    # the write path is a driver materialization.
    #
    # Dynamic overwrite only replaces partitions PRESENT in the new data; a
    # retried partition whose re-run now yields zero rows for a sink (config
    # change, partial file set from a mid-write crash) would otherwise keep
    # its stale files. Deleting the pending partitions' sink subdirectories
    # first makes retry semantics replace-always, not replace-if-nonempty.
    # O(pending) driver-side metadata calls against the FS — no data moves.
    sinks = [
        ("violations", observed),
        ("stats", res.stats),
        ("verdicts", res.verdicts),
    ]
    if res.states is not None:
        sinks.append(("states", res.states))
    if res.audio_states is not None:
        sinks.append(("audio_states", res.audio_states))
    _delete_pending_sink_dirs(
        spark, out_dir, tuple(name for name, _ in sinks), pending
    )

    # The sink writes are independent jobs over already-persisted narrow
    # intermediates — run them CONCURRENTLY so each write's task tail
    # back-fills the others (guide §2.6); FIFO scheduling keeps this a
    # latency overlap, not a resource fight. Job descriptions/groups are
    # thread-local, so the UI labels stay per-sink.
    def _write(item: tuple) -> None:
        name, df = item
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("part_id")
            .parquet(f"{out_dir}/{name}")
        )

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(sinks)) as pool:
        list(pool.map(_write, sinks))
    run_metrics = dict(obs.get)  # side effect of the violations write

    # Per-partition manifest metrics from the WRITTEN verdicts (reads back
    # O(parts × checks) tiny rows and doubles as a sink self-check).
    per_part = {
        int(r["part_id"]): (r["n_rows"] or 0, r["n_viol"] or 0)
        for r in spark.read.parquet(f"{out_dir}/verdicts")
        .where(F.col("part_id").isin([int(p) for p in pending]))
        .groupBy("part_id")
        .agg(F.max("n_rows").alias("n_rows"), F.sum("n_violations").alias("n_viol"))
        .collect()
    }
    for p in pending:
        n_rows, n_viol = per_part.get(int(p), (0, 0))
        manifest_mod.commit_partition(
            manifest_path, int(p), int(n_rows), int(n_viol), started
        )
    res.unpersist()
    import sys

    print(
        f"baskerville_spark: processed parts={pending} metrics={run_metrics}",
        file=sys.stderr,
    )
    return [int(p) for p in pending]


def table_stats_from_states(
    spark: SparkSession, out_dir: str, cfg: ValidationConfig
) -> DataFrame:
    """Current TABLE-level stats folded from the tiny per-partition state
    rows the resumable runs wrote to ``{out_dir}/states`` — settled
    partitions are never rescanned (at 10^12 rows the state table is
    O(partitions), not O(clips)). Exact for counts/nulls/min/max/integral
    sums and histogram bins; distinct comes back as the HLL union estimate
    (consume through a margin, see stats_state's module doc)."""
    from baskerville_spark.checks import stats_state as stats_state_mod

    st = spark.read.parquet(f"{out_dir}/states")
    distinct = [c for c in cfg.state_distinct_cols if f"{c}_hll" in st.columns]
    merged = stats_state_mod.merge_stats_states(
        st,
        [],
        list(cfg.numeric_cols),
        distinct,
        hist_cols=dict(cfg.state_hist_edges) or None,
    )
    return stats_state_mod.finalize_stats(merged, distinct)


def route_quarantine(
    clips: DataFrame,
    violations: DataFrame,
    key: str = "clip_id",
    part_col: str = "part_id",
) -> tuple[DataFrame, DataFrame]:
    """Split the input into (clean, quarantine) around the violations
    table — the routing step that keeps bad rows out of a training corpus
    while preserving them (with machine-readable reasons) for triage, the
    engine-native form of the reference's anomalous-request quarantining
    (its predictions mark rows for the challenge path rather than
    deletion).

    quarantine carries ``reasons`` = the sorted set of violated check
    names per key (bounded by the check count — collect_set can't blow
    up). Joins are on (part, key): violations are per-partition facts, and
    keys are only guaranteed unique within a partition. The reasons side
    is O(violating keys) — usually tiny (AQE broadcasts it), but a
    pathological table can have violations on most rows, so no broadcast
    is FORCED; the joins degrade to co-partitioned sort-merge. clean ∪
    quarantine is an exact partition of the input: every row whose key is
    listed is quarantined — including ALL physical copies of a duplicated
    key.
    """
    reasons = violations.groupBy(part_col, key).agg(
        F.sort_array(F.collect_set("check_name")).alias("reasons")
    )
    quarantine = clips.join(reasons, [part_col, key], "inner")
    clean = clips.join(
        reasons.select(part_col, key), [part_col, key], "left_anti"
    )
    return clean, quarantine
