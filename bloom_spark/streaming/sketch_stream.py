"""Structured Streaming over the sketch library.

The reference is a single-pass unbounded stdin loop whose only state is
the container chain (reference: src/bloom/process.rs:42-79). The Spark
analog: ``readStream → foreachBatch`` where each micro-batch builds
per-partition segments, merges them into the persisted global sketch,
and (for dedup) emits the batch's surviving rows — the sketch IS the
state store, and it lives in a ``SketchCheckpoint`` so a restarted query
resumes from the last committed batch (idempotent per batch_id, the
exactly-once contract foreachBatch requires).
"""

from __future__ import annotations

import os
import shutil
from typing import Callable, Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bloom_spark.hashing import to_uint64
from bloom_spark.ops.build import (
    H1_COL,
    H2_COL,
    SEGMENT_SCHEMA,
    build_segments,
    merge_segments,
    with_hash_columns,
)
from bloom_spark.ops.checkpoint import SketchCheckpoint
from bloom_spark.ops.dedup import exact_dedup, filter_members
from bloom_spark.sketch.base import Sketch

GLOBAL = "stream_global"


def _sketch_name(batch_id: int) -> str:
    return f"{GLOBAL}.b{int(batch_id)}"


def _load_global(ck: SketchCheckpoint) -> Sketch | None:
    """The filter state as of the LAST COMMITTED batch.

    Sketch saves are versioned per batch id and resolved through the
    manifest: a crash after ``save_sketch`` but before ``_commit`` must
    leave the previous batch's filter authoritative, otherwise the
    replayed batch would see its own keys as duplicates and emit (then
    overwrite in place) an empty survivor set — silent row loss, the
    mirror image of the duplicate-append bug this replaces."""
    info = ck.run_info("stream_batches")
    if not info or not info["units"]:
        return None
    return ck.load_sketch(_sketch_name(max(info["units"])))


def load_stream_state(ck: SketchCheckpoint) -> Sketch | None:
    """Public accessor for the committed global stream filter/sketch."""
    return _load_global(ck)


def _committed(ck: SketchCheckpoint, batch_id: int) -> bool:
    info = ck.run_info("stream_batches")
    return bool(info) and int(batch_id) in info["units"]


def _commit(ck: SketchCheckpoint, batch_id: int, n_rows: int) -> None:
    # lock the read-modify-write: a concurrent batch build under the
    # same root must not erase this commit (r3 review)
    with ck._manifest_lock():
        manifest = ck._read_manifest()
        run = manifest["runs"].setdefault(
            "stream_batches", {"units": [], "rows": {}}
        )
        if int(batch_id) not in run["units"]:
            run["units"] = sorted(run["units"] + [int(batch_id)])
        run.setdefault("rows", {})[str(batch_id)] = int(n_rows)
        ck._commit_manifest(manifest)
    # prune superseded sketch versions (keep the two newest committed)
    import os

    for old in run["units"][:-2]:
        try:
            os.remove(ck.sketch_path(_sketch_name(old)))
        except FileNotFoundError:
            pass


def foreach_batch_sketch_build(
    ck: SketchCheckpoint,
    cols: list[str],
    factory: Callable[[], Sketch],
    value_col: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch fn: fold each micro-batch into the persisted global
    sketch. Re-delivered batches (restart replay) are skipped by id."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        if _committed(ck, batch_id):
            return
        segs = build_segments(batch_df, cols, factory, value_col=value_col)
        sketch, n = merge_segments(segs)
        current = _load_global(ck)
        if current is not None:
            sketch = current.merge(sketch)
        # versioned save + manifest commit: a replay after a crash folds
        # the batch into the LAST COMMITTED state again instead of
        # double-merging into an already-updated global (CMS/HLL counts
        # would otherwise drift)
        ck.save_sketch(_sketch_name(batch_id), sketch)
        _commit(ck, batch_id, n)

    return fn


def _sink_and_segments_map(
    staging: str,
    in_cols: list[str],
    factory: Callable[[], Sketch],
    arrow_schema,
    ltz_cols: list[str] = (),
    session_tz: str = "UTC",
):
    """mapInPandas fn: write this partition's survivor rows as a parquet
    part file into ``staging`` AND fold their hashes into one sketch
    segment — the sink write and the filter fold share a single pass
    (and a single Spark job), the ``ops.sharded`` executors-write-files
    pattern applied to the micro-batch sink. Part files go through a
    tmp name + atomic ``os.replace`` so task retries never leave a torn
    file; names are partition-deterministic so a replayed batch
    overwrites itself."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow as pa
        import pyarrow.parquet as pq

        sketch = factory()
        n = 0
        writer = None
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        # pid-suffixed tmp: a speculative/zombie attempt of the same
        # partition must not interleave pages into this attempt's file
        # (both produce identical content; os.replace publishes one whole)
        tmp = os.path.join(staging, f".part-{pid:05d}.tmp{os.getpid()}")
        dst = os.path.join(staging, f"part-{pid:05d}.parquet")
        try:
            for pdf in batches:
                if not len(pdf):
                    continue
                sketch.update_hashes(
                    to_uint64(pdf[H1_COL]), to_uint64(pdf[H2_COL])
                )
                n += len(pdf)
                out = pdf[in_cols]
                # TIMESTAMP (ltz) columns arrive as NAIVE session-local
                # wall times; the arrow schema (or a parquet reader)
                # would stamp them UTC — localize first so the written
                # instants are correct in any session timezone
                for c in ltz_cols:
                    if out[c].dt.tz is None:
                        out = out.assign(**{c: out[c].dt.tz_localize(session_tz)})
                tbl = pa.Table.from_pandas(
                    out, schema=arrow_schema, preserve_index=False
                )
                if writer is None:
                    os.makedirs(staging, exist_ok=True)
                    # coerce: pandas ns timestamps otherwise land as
                    # TIMESTAMP(NANOS), which Spark's reader rejects
                    writer = pq.ParquetWriter(
                        tmp,
                        tbl.schema,
                        coerce_timestamps="us",
                        allow_truncated_timestamps=True,
                    )
                writer.write_table(tbl)
        finally:
            if writer is not None:
                writer.close()
        if writer is not None:
            os.replace(tmp, dst)
        yield pd.DataFrame(
            {"segment_id": [pid], "n_rows": [n], "sketch": [sketch.to_bytes()]}
        )

    return fn


def foreach_batch_bloom_dedup(
    ck: SketchCheckpoint,
    keys: list[str],
    factory: Callable[[], Sketch],
    sink_dir: str,
    order_col: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """Streaming dedup: per micro-batch, drop rows already in the global
    filter (seen in ANY earlier batch of a COMMITTED state), exact-dedup
    within the batch, overwrite the batch's own ``batch_id=N`` sink
    directory with its survivors, then fold the batch's keys into a
    versioned filter save and commit. Every step is idempotent under
    replay-after-crash: the sink overwrite cannot append duplicates and
    the versioned filter cannot hide the batch's own keys from its
    replay. ≙ the reference's default pipeline (EP-A) with the input
    arriving incrementally."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        if _committed(ck, batch_id):
            return
        spark = batch_df.sparkSession
        current = _load_global(ck)
        fresh = (
            filter_members(spark, batch_df, keys, current, keep_members=False)
            if current is not None
            else batch_df
        )
        survivors = exact_dedup(fresh, keys, order_col=order_col)
        # ONE job per micro-batch: executors write the sink part files
        # themselves while folding the survivors' hashes into segments
        # (the ops.sharded executors-write-files pattern) — r3 ran the
        # probe pipeline for the sink write, then a parquet read-back,
        # then a limit(1).count() emptiness probe: three jobs and two
        # scans per batch (r3 verdict; a persist-based variant was
        # measured ~2x slower warm than even that — block-manager
        # caching of the tiny 32-partition batch cost more than the
        # re-scan it saved). Idempotency: files land in a dot-prefixed
        # staging dir (invisible to parquet readers), atomically swapped
        # over the batch's batch_id=N dir only after the job completes —
        # a crash mid-job leaves the previous commit authoritative, and
        # a replayed batch overwrites its own staging.
        in_cols = batch_df.columns
        final_dir = f"{sink_dir}/batch_id={int(batch_id)}"
        staging = f"{sink_dir}/.staging_batch_{int(batch_id)}"
        shutil.rmtree(staging, ignore_errors=True)
        os.makedirs(staging, exist_ok=True)
        try:
            from pyspark.sql.pandas.types import to_arrow_schema

            arrow_schema = to_arrow_schema(
                survivors.select(*in_cols).schema
            )
        except Exception:
            arrow_schema = None  # fall back to per-batch inference
        from pyspark.sql.types import TimestampType

        ltz_cols = [
            f.name
            for f in batch_df.schema.fields
            if isinstance(f.dataType, TimestampType)
        ]
        session_tz = spark.conf.get("spark.sql.session.timeZone", "UTC")
        hashed = with_hash_columns(survivors, keys).select(
            *in_cols, H1_COL, H2_COL
        )
        segs = hashed.mapInPandas(
            _sink_and_segments_map(
                staging, in_cols, factory, arrow_schema,
                ltz_cols=ltz_cols, session_tz=session_tz,
            ),
            SEGMENT_SCHEMA,
        )
        try:
            sketch, n = merge_segments(segs)
        except ValueError:
            # zero-partition batch plan: nothing scanned, nothing to fold
            sketch, n = factory(), 0
        shutil.rmtree(final_dir, ignore_errors=True)
        os.replace(staging, final_dir)
        if current is not None:
            sketch = current.merge(sketch)
        ck.save_sketch(_sketch_name(batch_id), sketch)
        _commit(ck, batch_id, n)

    return fn


def run_available_now(
    stream_df: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
) -> None:
    """Drain everything currently available through foreachBatch and
    stop — the deterministic test/drive harness for the streaming path."""
    q = (
        stream_df.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stateful_bloom_dedup(
    stream_df: DataFrame,
    keys: list[str],
    factory: Callable[[], Sketch],
    num_groups: int = 32,
) -> DataFrame:
    """Custom stateful streaming dedup via ``applyInPandasWithState``:
    the Spark state store holds one serialized Bloom segment per hash
    group, and each micro-batch emits only rows whose key was never seen
    in ANY earlier batch of that group.

    This is the reference's ``check_and_set`` loop (container.rs:24,
    process.rs:134-180) lifted onto Spark's keyed state machinery: group
    = ``xxhash64(keys) % num_groups`` (so state shards scale with
    executors and no single filter must fit one task), probe+insert is
    batch-vectorized on precomputed hashes, and state round-trips as the
    sketch envelope. Exact within a batch, FPR-bounded across batches.

    Returns the transformed *streaming* DataFrame (original columns);
    caller attaches the sink. Output mode must be ``append``/``update``.
    """
    from bloom_spark.hashing import to_uint64
    from bloom_spark.ops.build import H1_COL, H2_COL, with_hash_columns

    in_cols = stream_df.columns
    hashed = with_hash_columns(stream_df, keys).withColumn(
        "__bs_grp", F.pmod(F.col(H1_COL), F.lit(num_groups)).cast("int")
    )
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in stream_df.schema.fields
    )

    def fn(key, pdfs, state):
        if state.exists:
            (blob,) = state.get
            sketch = Sketch.from_bytes(bytes(blob))
        else:
            sketch = factory()
        for pdf in pdfs:
            seen = sketch.check_and_set_hashes(
                to_uint64(pdf[H1_COL]), to_uint64(pdf[H2_COL])
            )
            fresh = pdf.loc[~seen, in_cols]
            if len(fresh):
                yield fresh
        state.update((sketch.to_bytes(),))

    return hashed.groupBy("__bs_grp").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="sketch binary",
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def windowed_event_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """The built-in streaming agg the reference lacks entirely: watermarked
    tumbling-window counts (late rows beyond the watermark dropped by
    Spark's state store) — included so the streaming surface covers the
    windows/watermark semantics of SURVEY.md §2.6."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col(key_col),
            F.col("cnt"),
        )
    )
