"""Sharded filter artifact: build + probe a global filter as S
independent shard FILES — no driver fold, no single-file write.

Why (VERDICT r2): the single-artifact path (build_sketch →
treeAggregate → driver writes one file) carries a measured serial term
∝ m — the driver's final fold plus the filter materialization (~18 s at
m=2^30, doubling with m) — which capped the filter-job N→4N scaling at
0.679. Sharding deletes the term entirely:

- each key belongs to shard ``pmod(h1, S)``; one exchange routes keys
  so every shard's keys land in exactly one task;
- that task builds the shard filter (sized expected_n/S·2, so TOTAL
  memory ≈ one global filter) and writes ``shard_{s}.sk`` itself —
  builds and writes run in parallel on executors, the driver only
  collects an S-row manifest;
- probes memory-map only the shard file each key routes to: the OS
  page cache shares one physical copy per host, and no single mapping
  exceeds m/S bits — filters far beyond driver (or executor) memory
  stay probeable.

On a cluster, ``out_dir`` is shared storage (the same place the
single-file artifact went); in local mode it is a directory. Writes go
through a temp file + atomic rename so a re-executed task (retry,
speculation) can never leave a torn shard.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from bloom_spark.hashing import to_uint64
from bloom_spark.ops.build import H1_COL, H2_COL, with_hash_columns
from bloom_spark.sketch import BloomSketch
from bloom_spark.sketch.base import sketch_from_bytes

MANIFEST = "manifest.json"

_MANIFEST_SCHEMA = "shard long, n_rows long, n_bytes long"

# build-side accumulation granularity: hashes are buffered to this many
# rows before one argsort + per-shard scatter (one update_hashes call per
# shard per flush). Bounds task memory at FLUSH_ROWS x 16 B regardless of
# partition size; module-level so tests can pin multi-flush behavior.
FLUSH_ROWS = 2_000_000


def shard_path(out_dir: str, shard: int) -> str:
    return os.path.join(out_dir, f"shard_{shard:05d}.sk")


def _fresh_dir(path: str, patterns: tuple[str, ...]) -> None:
    """Overwrite semantics for an artifact output directory: create it
    and remove files matching ``patterns`` left by a PREVIOUS run.
    Without this, reusing a directory silently unions stale shard files
    (wrong membership answers) or stale survivor part files into the
    result — every other sink in jobs/dedup.py uses .mode('overwrite'),
    so the artifact dirs must match (ADVICE r4)."""
    import fnmatch

    os.makedirs(path, exist_ok=True)
    for name in os.listdir(path):
        if any(fnmatch.fnmatch(name, p) for p in patterns):
            try:
                os.remove(os.path.join(path, name))
            except FileNotFoundError:
                pass


_SHARD_PATTERNS = ("shard_*.sk", "shard_*.sk.tmp*", MANIFEST, MANIFEST + ".tmp*")
_SURVIVOR_PATTERNS = ("part-*.parquet", "part-*.parquet.tmp*")


def build_sharded_bloom(
    df: DataFrame,
    cols: list[str],
    out_dir: str,
    n_shards: int,
    expected_n: int,
    fpr: float = 1e-6,
) -> dict:
    """Build the sharded artifact; returns (and writes) the manifest.

    One exchange (repartition on the shard id), then every task folds
    its shards' hashes into per-shard BloomSketches and writes them
    directly. Per-shard capacity is ``expected_n/S · 2`` (2x slack for
    hash imbalance — the same sizing the single-pass dedup uses), so
    the union of shards costs ≈ one global filter.
    """
    _fresh_dir(out_dir, _SHARD_PATTERNS)
    flush_rows = FLUSH_ROWS  # captured at call time so tests can pin it
    n_part = max(4096, -(-int(expected_n) // n_shards) * 2)
    # the shard id is NOT materialized as a shuffle column: the exchange
    # partitions on the pmod expression directly (16 B/row on the wire
    # instead of 24) and the worker recomputes it from h1 — bit-identical
    # to the probe side's routing (int64 % positive == pmod)
    hashed = (
        with_hash_columns(df, cols)
        .select(H1_COL, H2_COL)
        .repartition(n_shards, F.pmod(F.col(H1_COL), F.lit(n_shards)))
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sketches: dict[int, BloomSketch] = {}
        counts: dict[int, int] = {}
        # accumulate Arrow batches and flush every FLUSH_ROWS rows: one
        # argsort + one scatter per shard per flush, instead of a pandas
        # groupby + up to n_shards tiny update_hashes calls per 10k-row
        # batch — the 100 TB-safe shape.
        acc1: list[np.ndarray] = []
        acc2: list[np.ndarray] = []
        acc_n = 0

        def flush() -> None:
            nonlocal acc1, acc2, acc_n
            if not acc_n:
                return
            h1 = np.concatenate(acc1)
            h2 = np.concatenate(acc2)
            acc1, acc2, acc_n = [], [], 0
            shards = h1.view(np.int64) % n_shards  # == pmod (int64 % pos ≥ 0)
            order = np.argsort(shards, kind="stable")
            ss = shards[order]
            bounds = np.flatnonzero(np.diff(ss)) + 1
            for seg in np.split(order, bounds):
                s = int(shards[seg[0]])
                sk = sketches.get(s)
                if sk is None:
                    sk = sketches[s] = BloomSketch.from_fpr(n_part, fpr, limit=None)
                    counts[s] = 0
                sk.update_hashes(h1[seg], h2[seg])
                counts[s] += len(seg)

        for pdf in batches:
            if not len(pdf):
                continue
            acc1.append(to_uint64(pdf[H1_COL]))
            acc2.append(to_uint64(pdf[H2_COL]))
            acc_n += len(pdf)
            if acc_n >= flush_rows:
                flush()
        flush()
        rows = {"shard": [], "n_rows": [], "n_bytes": []}
        for s, sk in sketches.items():
            blob = sk.densify().to_bytes()
            tmp = shard_path(out_dir, int(s)) + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, shard_path(out_dir, int(s)))
            rows["shard"].append(int(s))
            rows["n_rows"].append(counts[s])
            rows["n_bytes"].append(len(blob))
        if rows["shard"]:
            yield pd.DataFrame(rows)

    entries = hashed.mapInPandas(build, _MANIFEST_SCHEMA).collect()
    manifest = {
        "n_shards": int(n_shards),
        "fpr": float(fpr),
        "expected_n": int(expected_n),
        "per_shard_capacity": int(n_part),
        "shards": sorted(
            ({"shard": r["shard"], "n_rows": r["n_rows"], "n_bytes": r["n_bytes"]}
             for r in entries),
            key=lambda e: e["shard"],
        ),
    }
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f)
    return manifest


_WORKER_SHARD_CACHE: dict = {}


def sharded_membership_udf(out_dir: str):
    """A pandas UDF ``(h1, h2) -> bool`` probing the sharded artifact.

    Per batch: route each row to ``pmod(h1, S)`` (the build's shard
    function), group rows by shard, probe each touched shard's
    memory-mapped filter. A shard whose file is absent (no keys ever
    routed there) answers False. Worker-cached per (dir, shard).
    """
    with open(os.path.join(out_dir, MANIFEST)) as f:
        n_shards = int(json.load(f)["n_shards"])

    def _shard_cached(s: int):
        """Keyed by (dir, shard, mtime, size): a shard REWRITTEN at the
        same path (artifact rebuilt in the same session) is re-mapped
        instead of probed stale, and a shard that was absent earlier is
        re-checked with a plain stat each batch — never cached as
        permanently absent (r3 review)."""
        path = shard_path(out_dir, s)
        try:
            st = os.stat(path)
        except FileNotFoundError:
            return None  # no keys ever routed here → nothing is a member
        key = (out_dir, s, st.st_mtime_ns, st.st_size)
        sk = _WORKER_SHARD_CACHE.get(key)
        if sk is None:
            for k in [k for k in _WORKER_SHARD_CACHE if k[:2] == (out_dir, s)]:
                del _WORKER_SHARD_CACHE[k]
            buf = np.memmap(path, dtype=np.uint8, mode="r")
            sk = sketch_from_bytes(buf)
            _WORKER_SHARD_CACHE[key] = sk
        return sk

    @F.pandas_udf("boolean")
    def probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        n = len(h1)
        out = np.zeros(n, dtype=bool)
        if n == 0:  # empty Arrow batch: np.split would yield one empty
            return pd.Series(out)  # segment and seg[0] would raise
        h1v = h1.to_numpy(dtype=np.int64)
        h2v = to_uint64(h2)
        shards = h1v % n_shards  # == pmod: numpy int64 % positive ≥ 0
        order = np.argsort(shards, kind="stable")
        sorted_shards = shards[order]
        bounds = np.flatnonzero(np.diff(sorted_shards)) + 1
        for seg in np.split(order, bounds):
            sk = _shard_cached(int(shards[seg[0]]))
            if sk is not None:
                out[seg] = sk.contains_hashes(to_uint64(h1v[seg]), h2v[seg])
        return pd.Series(out)

    return probe


def is_sharded_artifact(path: str) -> bool:
    return os.path.isdir(path) and os.path.exists(os.path.join(path, MANIFEST))


def _read_manifest(art_dir: str) -> dict:
    with open(os.path.join(art_dir, MANIFEST)) as f:
        return json.load(f)


def _write_manifest(out_dir: str, manifest: dict) -> None:
    tmp = os.path.join(out_dir, MANIFEST + f".tmp{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(out_dir, MANIFEST))


def _link_or_copy(src: str, dst: str) -> None:
    """Hard-link when the filesystem allows (instant, shares blocks);
    fall back to a tmp-copy + atomic rename so a crash mid-copy can
    never leave a torn shard that a re-run would then skip. Used for
    shards an update never touched."""
    import shutil

    if os.path.exists(dst):
        # recovery-only fast path: reuse dst ONLY when it is provably this
        # src (same inode from an earlier link). Same-SIZE is not evidence
        # — every shard in an artifact shares the geometry byte size, so a
        # stale shard would pass. Anything else is replaced (ADVICE r4: a
        # bare exists-check silently kept wrong shards; out dirs are also
        # now cleared upfront by _fresh_dir).
        s, d = os.stat(src), os.stat(dst)
        if (s.st_dev, s.st_ino) == (d.st_dev, d.st_ino):
            return
        os.remove(dst)
    try:
        os.link(src, dst)
    except OSError:
        tmp = dst + f".tmp{os.getpid()}"
        shutil.copyfile(src, tmp)
        os.replace(tmp, dst)


def update_sharded_bloom(
    df: DataFrame,
    cols: list[str],
    in_dir: str,
    out_dir: str,
    survivors_dir: str | None = None,
    order_col: str | None = None,
    on_full: str = "warn",
) -> dict:
    """Incremental ``check_and_set`` update of a sharded artifact — the
    reference CLI's flagship loop (load filter file → check_and_set each
    line → write filter back, process.rs:134-180) at the 10^12-key
    artifact scale.

    Copy-on-update: tasks READ shards from ``in_dir`` and WRITE updated
    shards to ``out_dir`` (must differ), so a retried or speculatively
    re-executed task re-reads the pristine input shard and reproduces
    byte-identical output — in-place mutation would make retries
    non-idempotent (the second execution would see its own writes and
    emit zero survivors). ``in_dir`` stays valid as a snapshot; callers
    wanting in-place semantics rename afterwards.

    One exchange routes the batch's rows to their shard (``pmod(h1,
    S)`` — the build's routing); each task loads its shards' filters
    (writable copy of the file bytes), streams ``check_and_set`` over
    the Arrow batches in partition order (``order_col`` sorts within the
    partition for exact first-occurrence-wins), writes the updated shard
    atomically, and — when ``survivors_dir`` is given — writes the rows
    whose key was NOT already present as one parquet part file per task
    (atomic rename; a retry overwrites with identical content). The
    driver only collects the S'-row delta manifest and hard-links the
    untouched shards into ``out_dir``.

    Returns the new manifest. Survivors (if requested) are read with
    ``spark.read.parquet(survivors_dir)``.

    Single-writer per artifact version, like the reference's file: two
    concurrent updates writing the same ``out_dir`` race on shard files.

    ``on_full`` mirrors the reference CLI's fullness tracking
    (process.rs prints "All containers are full, writing disabled" and
    stops inserting): after the update, any shard whose accumulated
    ``n_rows`` exceeds ``per_shard_capacity`` has blown its sized FPR
    budget — ``"warn"`` (default) emits a warning naming the shards,
    ``"error"`` raises (the out_dir artifact is written either way so
    the caller can inspect it), ``"ignore"`` stays silent.
    """
    if os.path.abspath(in_dir) == os.path.abspath(out_dir):
        raise ValueError(
            "update_sharded_bloom is copy-on-update: out_dir must differ "
            "from in_dir (rename afterwards for in-place semantics)"
        )
    if on_full not in ("warn", "error", "ignore"):
        raise ValueError(f"on_full must be warn|error|ignore, got {on_full!r}")
    manifest = _read_manifest(in_dir)
    n_shards = int(manifest["n_shards"])
    n_part = int(manifest["per_shard_capacity"])
    fpr = float(manifest["fpr"])
    _fresh_dir(out_dir, _SHARD_PATTERNS)
    if survivors_dir is not None:
        _fresh_dir(survivors_dir, _SURVIVOR_PATTERNS)

    out_cols = df.columns
    # TIMESTAMP (ltz) columns arrive in pandas as NAIVE wall times in the
    # session timezone; written as-is they become parquet NTZ. Localize
    # them before the part write so they round-trip as UTC-adjusted
    # timestamps (what Spark reads back as TIMESTAMP).
    from pyspark.sql.types import TimestampType

    ltz_cols = [f.name for f in df.schema.fields
                if isinstance(f.dataType, TimestampType)]
    session_tz = df.sparkSession.conf.get(
        "spark.sql.session.timeZone", "UTC"
    )
    hashed = with_hash_columns(df, cols)
    if survivors_dir is None:
        hashed = hashed.select(H1_COL, H2_COL)
    hashed = hashed.repartition(n_shards, F.pmod(F.col(H1_COL), F.lit(n_shards)))
    # the sort chooses WHICH copy survives — meaningless without a
    # survivors sink (any copy sets the same filter bits), and the
    # column was projected away above
    if order_col is not None and survivors_dir is not None:
        hashed = hashed.sortWithinPartitions(order_col)

    def upd(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        sketches: dict[int, BloomSketch] = {}
        fresh_counts: dict[int, int] = {}
        survivors: list[pd.DataFrame] = []

        def shard_sketch(s: int) -> BloomSketch:
            sk = sketches.get(s)
            if sk is None:
                path = shard_path(in_dir, s)
                if os.path.exists(path):
                    # plain read (not mmap): the whole shard is about to
                    # be mutated, so the copy is paid either way
                    with open(path, "rb") as f:
                        sk = sketch_from_bytes(f.read())
                else:  # no keys ever routed here in the base artifact
                    sk = BloomSketch.from_fpr(n_part, fpr, limit=None)
                sketches[s] = sk
                fresh_counts[s] = 0
            return sk

        for pdf in batches:
            if not len(pdf):
                continue
            h1 = to_uint64(pdf[H1_COL])
            h2 = to_uint64(pdf[H2_COL])
            shards = h1.view(np.int64) % n_shards
            order = np.argsort(shards, kind="stable")
            ss = shards[order]
            bounds = np.flatnonzero(np.diff(ss)) + 1
            seen = np.empty(len(pdf), dtype=bool)
            for seg in np.split(order, bounds):
                s = int(shards[seg[0]])
                sk = shard_sketch(s)
                seen[seg] = sk.check_and_set_hashes(h1[seg], h2[seg])
                fresh_counts[s] += int((~seen[seg]).sum())
            if survivors_dir is not None:
                fresh = pdf.loc[~seen, out_cols]
                if len(fresh):
                    survivors.append(fresh)

        rows = {"shard": [], "n_rows": [], "n_bytes": []}
        for s, sk in sketches.items():
            blob = sk.densify().to_bytes()
            tmp = shard_path(out_dir, s) + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, shard_path(out_dir, s))
            rows["shard"].append(s)
            rows["n_rows"].append(fresh_counts[s])
            rows["n_bytes"].append(len(blob))
        if survivors_dir is not None and survivors:
            # no part file for partitions with zero survivors — an
            # empty pandas frame has no dtypes to write and absent
            # files read back as zero rows anyway
            pid = TaskContext.get().partitionId()
            part = os.path.join(survivors_dir, f"part-{pid:05d}.parquet")
            import pyarrow as pa
            import pyarrow.parquet as pq

            out = pd.concat(survivors, ignore_index=True)
            for c in ltz_cols:
                if out[c].dt.tz is None:
                    out[c] = out[c].dt.tz_localize(session_tz)
            tmp = part + f".tmp{os.getpid()}"
            # coerce to microseconds: pandas datetime64[ns] otherwise
            # lands as TIMESTAMP(NANOS), which Spark's reader rejects
            pq.write_table(
                pa.Table.from_pandas(out, preserve_index=False),
                tmp,
                coerce_timestamps="us",
                allow_truncated_timestamps=True,
            )
            os.replace(tmp, part)
        if rows["shard"]:
            yield pd.DataFrame(rows)

    entries = hashed.mapInPandas(upd, _MANIFEST_SCHEMA).collect()
    touched = {int(r["shard"]): r for r in entries}
    old = {int(e["shard"]): e for e in manifest["shards"]}
    shards_out = []
    for s in sorted(set(old) | set(touched)):
        if s in touched:
            n_rows = old.get(s, {}).get("n_rows", 0) + touched[s]["n_rows"]
            shards_out.append(
                {"shard": s, "n_rows": int(n_rows),
                 "n_bytes": int(touched[s]["n_bytes"])}
            )
        else:
            _link_or_copy(shard_path(in_dir, s), shard_path(out_dir, s))
            shards_out.append(old[s])
    new_manifest = dict(manifest, shards=shards_out)
    _write_manifest(out_dir, new_manifest)
    over = [e["shard"] for e in shards_out if e["n_rows"] > n_part]
    if over and on_full != "ignore":
        msg = (
            f"update_sharded_bloom: {len(over)} shard(s) exceed "
            f"per_shard_capacity={n_part} (e.g. shard {over[0]}): the "
            f"configured fpr={fpr} bound no longer holds — rebuild with a "
            "larger expected_n (reference: 'All containers are full, "
            "writing disabled', process.rs)"
        )
        if on_full == "error":
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return new_manifest


def merge_sharded_artifacts(
    spark, in_dirs: list[str], out_dir: str
) -> dict:
    """Union N same-geometry sharded artifacts shard-wise (bitmap OR) —
    e.g. per-day crawl filters folded into one corpus filter. Each shard
    id is merged by one task (S-way parallel, no driver bytes beyond the
    manifest); absent shards are skipped; a shard present in exactly one
    input is hard-linked, not rewritten. Manifest ``n_rows`` becomes the
    SUM of the inputs' counts — an upper bound on distinct keys (the
    bitmap union cannot recount overlaps), same convention as the
    reference's num_writes counter under merge."""
    if not in_dirs:
        raise ValueError("merge_sharded_artifacts needs at least one input")
    if any(os.path.abspath(d) == os.path.abspath(out_dir) for d in in_dirs):
        raise ValueError(
            "merge_sharded_artifacts: out_dir must differ from every input "
            "(outputs are written fresh; merging into an input would "
            "clobber it mid-merge)"
        )
    manifests = [_read_manifest(d) for d in in_dirs]
    # fpr is part of the geometry: same (shards, capacity) at different
    # fpr means different bitmap sizes m — without the upfront check the
    # job would die mid-merge inside an executor after some shards were
    # already written, leaving a torn output directory
    geo = {
        (m["n_shards"], m["per_shard_capacity"], float(m["fpr"]))
        for m in manifests
    }
    if len(geo) > 1:
        raise ValueError(f"incompatible artifact geometries: {sorted(geo)}")
    n_shards = int(manifests[0]["n_shards"])
    _fresh_dir(out_dir, _SHARD_PATTERNS)

    counts: dict[int, int] = {}
    for m in manifests:
        for e in m["shards"]:
            counts[int(e["shard"])] = counts.get(int(e["shard"]), 0) + int(e["n_rows"])
    sources = {
        s: [d for d in in_dirs if os.path.exists(shard_path(d, s))]
        for s in counts
    }
    multi = sorted(s for s, ds in sources.items() if len(ds) > 1)

    def merge_one(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = {"shard": [], "n_rows": [], "n_bytes": []}
        for pdf in batches:
            for s in pdf["shard"]:
                s = int(s)
                merged = None
                for d in sources[s]:
                    with open(shard_path(d, s), "rb") as f:
                        sk = sketch_from_bytes(f.read())
                    merged = sk if merged is None else merged.merge(sk)
                blob = merged.densify().to_bytes()
                tmp = shard_path(out_dir, s) + f".tmp{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(blob)
                os.replace(tmp, shard_path(out_dir, s))
                rows["shard"].append(s)
                rows["n_rows"].append(counts[s])
                rows["n_bytes"].append(len(blob))
        if rows["shard"]:
            yield pd.DataFrame(rows)

    merged_entries: list = []
    if multi:
        ids = spark.createDataFrame([(s,) for s in multi], "shard long")
        ids = ids.repartition(min(len(multi), n_shards))
        merged_entries = ids.mapInPandas(merge_one, _MANIFEST_SCHEMA).collect()
    got = {int(r["shard"]) for r in merged_entries}
    shards_out = []
    for s in sorted(counts):
        if s in got:
            e = next(r for r in merged_entries if int(r["shard"]) == s)
            shards_out.append(
                {"shard": s, "n_rows": counts[s], "n_bytes": int(e["n_bytes"])}
            )
        else:
            src = sources[s][0]
            _link_or_copy(shard_path(src, s), shard_path(out_dir, s))
            size = os.path.getsize(shard_path(out_dir, s))
            shards_out.append({"shard": s, "n_rows": counts[s], "n_bytes": size})
    new_manifest = dict(manifests[0], shards=shards_out)
    _write_manifest(out_dir, new_manifest)
    return new_manifest
