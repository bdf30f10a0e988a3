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
        # depth=1: micro-batch segment blobs are trigger-volume-sized
        # (sparse), so the driver's pull is tiny and treeAggregate's
        # extra combine level is pure per-trigger fixed cost (~0.2 s
        # measured at sf0.1 — r4 verdict item 4)
        sketch, n = merge_segments(segs, depth=1)
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


def _fused_dedup_sink_map(
    staging: str,
    in_cols: list[str],
    keys: list[str],
    factory: Callable[[], Sketch],
    blob_bc,
    token: str,
    arrow_schema,
    ltz_cols: list[str] = (),
    session_tz: str = "UTC",
):
    """mapInPandas fn doing the WHOLE per-batch dedup in one pass: probe
    the broadcast global filter, exact first-occurrence-wins dedup
    within the batch (rows arrive key-co-located via the ``pmod(h1,P)``
    exchange and, with an order column, partition-sorted — so per-key
    order is global order), write the partition's survivors as a
    parquet part file into ``staging``, and fold their hashes into one
    sketch segment. r4 ran three stages per micro-batch (pandas_udf
    probe → row_number window → sink+fold map); fusing them removes two
    Python crossings and the window, cutting the per-trigger constant —
    the dominant term at micro-batch volumes (r4 verdict item 4).

    Within-batch dedup is EXACT on key values (a per-partition seen-set
    across Arrow chunks — bounded by the micro-batch's distinct keys per
    partition, the same bound the window sort had); the cross-batch
    probe is FPR-bounded, as documented. Part files go through a tmp
    name + atomic ``os.replace`` so task retries never leave a torn
    file; names are partition-deterministic so a replayed batch
    overwrites itself."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from bloom_spark.ops.build import _WORKER_SKETCH_CACHE, _cache_put
        from bloom_spark.sketch.base import sketch_from_bytes

        current = None
        if blob_bc is not None:
            current = _WORKER_SKETCH_CACHE.get(token)
            if current is None:
                current = sketch_from_bytes(blob_bc.value)
                _cache_put(_WORKER_SKETCH_CACHE, token, current)
        sketch = factory()
        n = 0
        writer = None
        seen: set = set()
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
                h1 = to_uint64(pdf[H1_COL])
                h2 = to_uint64(pdf[H2_COL])
                if len(keys) == 1:
                    kvals = pdf[keys[0]]
                else:
                    kvals = pd.Series(
                        list(zip(*(pdf[k] for k in keys))), index=pdf.index
                    )
                mask = ~kvals.duplicated(keep="first").to_numpy()
                if seen:
                    mask &= ~kvals.isin(seen).to_numpy()
                if current is not None:
                    mask &= ~current.contains_hashes(h1, h2)
                # keys suppressed by the global filter re-suppress by
                # hash; keys suppressed by seen are already in seen — so
                # only emitted keys need remembering
                seen.update(kvals[mask])
                if not mask.any():
                    continue
                sketch.update_hashes(h1[mask], h2[mask])
                n += int(mask.sum())
                out = pdf.loc[mask, in_cols]
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
        # ONE job AND one Python stage per micro-batch: an exchange on
        # pmod(h1, P) co-locates equal keys (plus a partition sort when
        # order matters), then a single fused mapInPandas probes the
        # broadcast global filter, exact-dedups within the batch, writes
        # the sink part files, and folds survivor hashes into segments —
        # r4 ran probe (pandas_udf) → row_number window → sink+fold map:
        # three Python crossings per trigger whose fixed cost dominated
        # at micro-batch volume (r4 verdict item 4). Idempotency: files
        # land in a dot-prefixed staging dir (invisible to parquet
        # readers), atomically swapped over the batch's batch_id=N dir
        # only after the job completes — a crash mid-job leaves the
        # previous commit authoritative, and a replayed batch overwrites
        # its own staging.
        in_cols = batch_df.columns
        final_dir = f"{sink_dir}/batch_id={int(batch_id)}"
        staging = f"{sink_dir}/.staging_batch_{int(batch_id)}"
        shutil.rmtree(staging, ignore_errors=True)
        os.makedirs(staging, exist_ok=True)
        try:
            from pyspark.sql.pandas.types import to_arrow_schema

            arrow_schema = to_arrow_schema(
                batch_df.select(*in_cols).schema
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
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        hashed = (
            with_hash_columns(batch_df, keys)
            .select(*in_cols, H1_COL, H2_COL)
            .repartition(n_part, F.pmod(F.col(H1_COL), F.lit(n_part)))
        )
        if order_col is not None:
            # per-key global order == partition order: equal keys share a
            # partition, so the sort makes first-wins exact
            hashed = hashed.sortWithinPartitions(order_col)
        blob_bc = token = None
        if current is not None:
            import uuid

            token = uuid.uuid4().hex
            blob_bc = spark.sparkContext.broadcast(current.to_bytes())
        segs = hashed.mapInPandas(
            _fused_dedup_sink_map(
                staging, in_cols, keys, factory, blob_bc, token,
                arrow_schema, ltz_cols=ltz_cols, session_tz=session_tz,
            ),
            SEGMENT_SCHEMA,
        )
        try:
            # depth=1: per-trigger segments are micro-batch-sized
            # (sparse blobs), so the driver pull is small and the extra
            # tree level would be fixed cost per trigger (see
            # foreach_batch_sketch_build)
            sketch, n = merge_segments(segs, depth=1, n_segments=n_part)
        except ValueError:
            # zero-partition batch plan: nothing scanned, nothing to fold
            sketch, n = factory(), 0
        finally:
            if blob_bc is not None:
                blob_bc.unpersist()  # one broadcast per trigger: don't
                # accumulate executor copies over a long-running stream
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
