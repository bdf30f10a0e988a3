"""Checkpointed, resumable sketch builds with per-partition lineage.

North-rule requirement (BASELINE.json): "resumable from checkpoint with
per-partition lineage + metrics ... runs resume from the last committed
snapshot". The reference's analog is the filter-file workflow: a saved
container restores its params and counters on reopen (reference:
src/bloom/containers/container.rs:113-170, header read restores
num_writes at :157-167) so a second run continues where the first ended.

No Iceberg runtime jar ships in this container (SURVEY.md §7), so the
snapshot contract is implemented directly over parquet + an atomically
renamed JSON manifest — the same commit semantics (readers only ever see
a fully committed snapshot; a crashed writer leaves the previous
manifest intact and at worst an orphan data directory that the next run
overwrites idempotently):

    <root>/
      manifest.json                 # {"runs": {run_id: {committed units,
                                    #  params, totals}}} — atomic rename
      segments/<run_id>/unit=<u>/   # parquet: one row per build partition
                                    #  (segment_id, n_rows, sketch blob,
                                    #   unit, input_fingerprint)
      sketches/<name>.sk            # saved global sketch envelopes
                                    #  (≙ the reference's .blf filter file)

Work is split into ``n_units`` deterministic slices of the input
(``pmod(xxhash64(unit_col), n_units)``); each unit runs as its own Spark
job whose segment rows are written to the unit directory and then
committed to the manifest. A crash between units loses nothing
committed; rerunning skips committed units and finishes the rest. The
committed segment rows ARE the per-partition lineage table: every
partition's row carries its row count, an order-independent input
fingerprint, and sketch metrics.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bloom_spark.ops.build import build_segments, merge_segments, with_hash_columns
from bloom_spark.sketch.base import Sketch, sketch_from_bytes

UNIT_COL = "__bs_unit"

LINEAGE_SCHEMA = (
    "unit int, segment_id long, n_rows long, input_fingerprint long, "
    "sketch binary, sketch_bytes long, peak_rss_kb long, committed_ts double"
)


class SketchCheckpoint:
    """A directory-backed snapshot store for resumable sketch builds."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ---------------------------------------------------------------- manifest
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def _read_manifest(self) -> dict:
        try:
            with open(self._manifest_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"runs": {}}

    def _commit_manifest(self, manifest: dict) -> None:
        """Atomic replace: committed state is visible all-or-nothing."""
        fd, tmp = tempfile.mkstemp(dir=self.root, prefix=".manifest-")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._manifest_path)

    def _manifest_lock(self):
        """Advisory exclusive lock serializing manifest READ-MODIFY-WRITE
        cycles: each individual commit is atomic (replace), but two
        concurrent runs under one root could interleave read→write and
        erase each other's committed units (r3 review — e.g. a streaming
        _commit overlapping a batch build double-folds a batch on
        replay). flock works on local FS and NFSv4; object stores need an
        external coordinator (documented limitation)."""
        import contextlib
        import fcntl

        @contextlib.contextmanager
        def held():
            lock_path = os.path.join(self.root, ".manifest.lock")
            with open(lock_path, "w") as lf:
                fcntl.flock(lf.fileno(), fcntl.LOCK_EX)
                try:
                    yield
                finally:
                    fcntl.flock(lf.fileno(), fcntl.LOCK_UN)

        return held()

    def committed_units(self, run_id: str) -> set[int]:
        run = self._read_manifest()["runs"].get(run_id)
        return set(run["units"]) if run else set()

    def run_info(self, run_id: str) -> dict | None:
        return self._read_manifest()["runs"].get(run_id)

    # ---------------------------------------------------------------- build
    def _unit_dir(self, run_id: str, unit: int) -> str:
        return os.path.join(self.root, "segments", run_id, f"unit={unit}")

    def build(
        self,
        spark: SparkSession,
        df: DataFrame,
        cols: list[str],
        factory: Callable[[], Sketch],
        run_id: str,
        n_units: int = 8,
        unit_col: str | None = None,
        value_col: str | None = None,
        max_units: int | None = None,
    ) -> tuple[Sketch, int] | None:
        """Build (or resume) the global sketch over ``df``.

        ``unit_col`` (default: first key col) slices the input into
        ``n_units`` deterministic units; each unit is built and committed
        independently. ``max_units`` bounds how many *new* units this
        invocation processes (test hook ≙ a crash mid-run).

        Returns (sketch, total_rows) when every unit is committed, else
        None (partial progress committed; call again to resume).
        """
        unit_col = unit_col or (cols[0] if cols else value_col)
        if unit_col is None:
            raise ValueError("need unit_col, cols, or value_col to slice units")
        # resuming with different slicing OR different build inputs would
        # silently merge segments keyed/valued differently into one wrong
        # sketch — refuse instead (round-1 advice; key/value/factory
        # params added after the r3 review)
        probe = factory()
        factory_desc = {"kind": probe.KIND, **probe.params()}
        # drop counters that legitimately differ between an empty probe
        # and a resumed run
        for volatile in ("n_inserted", "n", "rng_counter", "dense",
                         "n_centroids", "level_sizes", "fmt"):
            factory_desc.pop(volatile, None)
        build_desc = {
            "n_units": n_units,
            "unit_col": unit_col,
            "cols": list(cols),
            "value_col": value_col,
            "factory": factory_desc,
        }
        info = self.run_info(run_id)
        if info is not None:
            for key, want in build_desc.items():
                have = info.get(key)
                if have is not None and have != want:
                    raise ValueError(
                        f"run {run_id!r} was started with {key}={have!r}; "
                        f"cannot resume with {key}={want!r} — the merged "
                        "sketch would silently mix incompatible segments"
                    )
        sliced = df.withColumn(
            UNIT_COL, F.pmod(F.xxhash64(F.col(unit_col), F.lit("unit")), F.lit(n_units))
        )

        done = self.committed_units(run_id)
        todo = [u for u in range(n_units) if u not in done]
        budget = len(todo) if max_units is None else min(max_units, len(todo))
        for unit in todo[:budget]:
            unit_df = sliced.where(F.col(UNIT_COL) == unit).drop(UNIT_COL)
            segs = _segments_with_lineage(unit_df, cols, factory, value_col, unit)
            # idempotent on retry: a re-run of an uncommitted unit overwrites
            segs.write.mode("overwrite").parquet(self._unit_dir(run_id, unit))
            with self._manifest_lock():
                manifest = self._read_manifest()
                run = manifest["runs"].setdefault(run_id, {"units": [], **build_desc})
                if unit not in run["units"]:
                    run["units"] = sorted(run["units"] + [unit])
                self._commit_manifest(manifest)
            done.add(unit)

        if len(done) < n_units:
            return None
        return self.merged(spark, run_id)

    def lineage(self, spark: SparkSession, run_id: str) -> DataFrame:
        """Per-partition lineage + metrics table for a run (committed only)."""
        units = sorted(self.committed_units(run_id))
        paths = [self._unit_dir(run_id, u) for u in units]
        if not paths:
            raise ValueError(f"run {run_id!r} has no committed units")
        return spark.read.parquet(*paths)

    def merged(self, spark: SparkSession, run_id: str) -> tuple[Sketch, int]:
        """Tree-merge all committed segments into the global sketch."""
        return merge_segments(self.lineage(spark, run_id))

    # ---------------------------------------------------------------- sketch files
    # ≙ reference EP-B save / EP-C load of .blf filter files
    # (src/main.rs:390-402, container.rs:53-88 & 113-170)
    def sketch_path(self, name: str) -> str:
        return os.path.join(self.root, "sketches", f"{name}.sk")

    def save_sketch(self, name: str, sketch: Sketch) -> str:
        path = self.sketch_path(name)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), prefix=".sk-")
        with os.fdopen(fd, "wb") as f:
            f.write(sketch.to_bytes())
        os.replace(tmp, path)
        return path

    def load_sketch(self, name: str) -> Sketch:
        with open(self.sketch_path(name), "rb") as f:
            return sketch_from_bytes(f.read())


def _segments_with_lineage(
    df: DataFrame,
    cols: list[str],
    factory: Callable[[], Sketch],
    value_col: str | None,
    unit: int,
) -> DataFrame:
    """build_segments + lineage columns (unit, order-independent input
    fingerprint = xor of row hashes via sum-mod trick, commit time)."""
    import pandas as pd
    from pyspark import TaskContext

    from bloom_spark.hashing import to_uint64
    from bloom_spark.ops.build import H1_COL, H2_COL

    if value_col is not None:
        src = df.select(
            F.col(value_col).cast("double").alias("__bs_value"),
            F.xxhash64(F.col(value_col)).alias(H1_COL),
            F.xxhash64(F.lit("fp"), F.col(value_col)).alias(H2_COL),
        ).where(F.col("__bs_value").isNotNull())
    else:
        src = with_hash_columns(df, cols).select(H1_COL, H2_COL)

    def fn(batches):
        import resource

        import numpy as np

        sketch = factory()
        n = 0
        fp = np.uint64(0)
        for pdf in batches:
            h1 = to_uint64(pdf[H1_COL])
            h2 = to_uint64(pdf[H2_COL])
            if value_col is not None:
                sketch.update_values(pdf["__bs_value"].to_numpy(dtype="float64"))
            else:
                sketch.update_hashes(h1, h2)
            n += len(pdf)
            fp ^= np.bitwise_xor.reduce(h1) if len(h1) else np.uint64(0)
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        blob = sketch.to_bytes()
        # M4 memory report ≙ the reference's -dm RSS deltas
        # (src/bloom/process.rs:82-91): peak RSS of the Python worker
        # that built this segment (ru_maxrss is KB on Linux), plus the
        # serialized sketch size — both per-partition lineage metrics.
        peak_rss_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        yield pd.DataFrame(
            {
                "unit": [unit],
                "segment_id": [pid],
                "n_rows": [n],
                "input_fingerprint": [int(fp.view(np.int64))],
                "sketch": [blob],
                "sketch_bytes": [len(blob)],
                "peak_rss_kb": [int(peak_rss_kb)],
                "committed_ts": [time.time()],
            }
        )

    return src.mapInPandas(fn, LINEAGE_SCHEMA)
