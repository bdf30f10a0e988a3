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

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bloom_spark.ops.build import build_segments, merge_segments
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
        # idempotent sink: each batch owns a batch_id-scoped directory,
        # written with overwrite — a crash between this write and the
        # manifest commit makes the replayed batch OVERWRITE its own
        # partial output instead of appending duplicates (round-1
        # advice; a plain append broke the exactly-once claim)
        survivors.write.mode("overwrite").parquet(
            f"{sink_dir}/batch_id={int(batch_id)}"
        )
        # fold the SURVIVORS (read back from the parquet the sink action
        # just materialized) instead of re-evaluating batch_df end to
        # end a second time (r3 review). Equivalent filter state: every
        # batch key is either already in `current` (dup) or present
        # among the survivors (its first occurrence) — and the read-back
        # costs one columnar scan of the survivor set, not a second full
        # source pipeline.
        written = spark.read.parquet(f"{sink_dir}/batch_id={int(batch_id)}")
        if written.limit(1).count() == 0:
            # all-duplicate micro-batch: nothing new to fold (an empty
            # parquet can read back as zero partitions → zero segments)
            sketch, n = (current if current is not None else factory()), 0
        else:
            segs = build_segments(written, keys, factory)
            sketch, n = merge_segments(segs)
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
