"""Snapshot-manifest table layer over parquet — the Iceberg semantics
(snapshot isolation, time travel, optimistic commits, stats-based file
skipping) hand-rolled because the Iceberg/Delta jars are absent from
this environment (BASELINE.json input_hint names an Iceberg table;
SURVEY §7.1).

What it reproduces, and how it maps onto the real thing:

- **A table is its snapshot list, not its directory listing.** Data
  files land in ``data/`` under write-once unique names; a snapshot is
  a JSON manifest ``_snapshots/v{N}.json`` naming exactly the files it
  contains plus per-file column stats. Readers NEVER glob ``data/`` —
  at crawl scale a directory listing of an object store is both slow
  and racy; the manifest is one small read (Iceberg's metadata file +
  manifest list, collapsed into one JSON here — at 10^6 files chunk
  the file list into side manifests exactly as Iceberg does).
- **Snapshot isolation + time travel.** Overwrite writes new files and
  a new snapshot that simply doesn't reference the old ones; the old
  snapshot stays readable (``version=``) until :func:`vacuum` drops
  files no retained snapshot references.
- **Optimistic commit.** The snapshot file is published with
  ``os.link`` (create-exclusive) — two writers racing to version N+1
  get one winner and one ``CommitConflict`` to retry on the new base,
  Iceberg's atomic-swap contract. Same shared-POSIX-filesystem
  contract as sources/warc.py's sink (object stores: conditional PUT).
- **Scan planning on stats.** Each manifest entry carries min/max per
  leaf column (read from the parquet footers the files already have —
  exactly where Iceberg gets them). :func:`read_table` prunes files
  against simple predicates BEFORE Spark ever sees a path, so a
  selective read of a 10^12-row table opens only the files whose
  range intersects — metadata-only pruning, no data I/O for misses.

The engine's own bucketed stores (sources/store.py) stay as-is — this
layer is the general table-format seam; ``materialize_triples``-style
ops would commit their bucket directories as snapshots on a real
deployment.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

SNAP_DIR = "_snapshots"
FORMAT_VERSION = 1


class CommitConflict(RuntimeError):
    """Another writer committed this version first — reread the latest
    snapshot and retry (Iceberg's optimistic-concurrency loss case)."""


def _snap_path(table: str, version: int) -> str:
    return os.path.join(table, SNAP_DIR, f"v{version}.json")


def _list_versions(table: str) -> list[int]:
    d = os.path.join(table, SNAP_DIR)
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def latest_version(table: str) -> int | None:
    vs = _list_versions(table)
    return vs[-1] if vs else None


def load_snapshot(table: str, version: int | None = None) -> dict:
    if version is None:
        version = latest_version(table)
        if version is None:
            raise FileNotFoundError(f"no snapshots in {table}")
    with open(_snap_path(table, version)) as f:
        snap = json.load(f)
    if snap.get("format_version") != FORMAT_VERSION:
        raise ValueError(
            f"snapshot v{version} has format_version "
            f"{snap.get('format_version')!r}, reader supports {FORMAT_VERSION}"
        )
    return snap


def _file_stats(path: str) -> dict:
    """Per-file row count + per-column min/max from the parquet footer —
    the same footer statistics Iceberg lifts into its manifests. Only
    primitive columns with usable stats appear; others are absent and
    simply never prune."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    stats: dict[str, list] = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            try:
                s = col.statistics
                if s is None or not s.has_min_max:
                    continue
                mn, mx = s.min, s.max
            except Exception:
                # pyarrow can't extract stats for some physical types
                # (e.g. Spark's INT96 timestamps raise
                # ArrowNotImplementedError) — skip, no-prune fallback
                continue
            name = col.path_in_schema
            if isinstance(mn, bytes):
                try:
                    mn, mx = mn.decode(), mx.decode()
                except UnicodeDecodeError:
                    continue
            # the manifest is JSON: only JSON-native stat types survive
            # the round trip (pyarrow hands back datetime/date/Decimal
            # objects for timestamp/date/decimal columns — json.dump
            # would crash the whole commit). Unstatted columns already
            # fall back to conservative no-prune, so skipping is safe;
            # timestamp pruning goes through hidden partitioning
            # (days(col)) instead, which stores JSON-native ints.
            if not isinstance(mn, (int, float, str)) or isinstance(mn, bool):
                continue
            cur = stats.get(name)
            if cur is None:
                stats[name] = [mn, mx]
            else:
                cur[0] = min(cur[0], mn)
                cur[1] = max(cur[1], mx)
    return {"rows": md.num_rows, "stats": stats}


def _lift_stats(spark: SparkSession | None, finals: list[str]) -> list[dict]:
    """Footer row-count + min/max stats for every final data file.

    Small commits (≤ ``SNAPTABLE_DRIVER_STATS_MAX`` files, default 32)
    use a driver thread pool — footer reads are tiny metadata fetches
    and a Spark job would cost more in task launch than it saves. Large
    commits go EXECUTOR-side: one ``mapInPandas`` pass over the path
    list, each task reading the footers of its slice locally (same
    shared-FS contract as the data write itself) and returning the
    stats as JSON rows; the driver only assembles the manifest. That
    keeps driver wall-time flat in file count — at 10^4–10^5 files per
    commit (a day of micro-batches, a big backfill) the old threaded
    driver loop serialized on one machine's NIC (VERDICT r05 ask #7;
    Iceberg lifts stats in its writer tasks for the same reason).
    Measured flat: see BENCH.md "stats-lift" appendix (64 vs 512
    files)."""
    if not finals:
        return []
    driver_max = int(os.environ.get("SNAPTABLE_DRIVER_STATS_MAX", "32"))
    if spark is None or len(finals) <= driver_max:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(16, len(finals))) as ex:
            return list(ex.map(_file_stats, finals))

    def lift(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "payload": [json.dumps(_file_stats(p)) for p in pdf["path"]],
                }
            )

    n_tasks = min(len(finals), max(1, spark.sparkContext.defaultParallelism))
    rows = (
        spark.createDataFrame([(p,) for p in finals], "path string")
        .repartition(n_tasks)
        .mapInPandas(lift, "path string, payload string")
        .collect()
    )
    by_path = {r["path"]: json.loads(r["payload"]) for r in rows}
    return [by_path[p] for p in finals]


def _write_data_files(df: DataFrame, table: str) -> list[dict]:
    """Executor-parallel parquet write into a private staging dir, then
    driver-side move to write-once unique names under ``data/`` with
    footer stats lifted into manifest entries. Files written here are
    INVISIBLE until some snapshot references them — an abandoned write
    leaves only orphans for vacuum, never a corrupt table."""
    data_dir = os.path.join(table, "data")
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(os.path.join(table, SNAP_DIR), exist_ok=True)
    staging = os.path.join(table, f".staging-{uuid.uuid4().hex[:12]}")
    df.write.mode("error").parquet(staging)
    finals = []
    for name in sorted(os.listdir(staging)):
        if not name.endswith(".parquet"):
            continue
        final = os.path.join(data_dir, f"{uuid.uuid4().hex}.parquet")
        os.replace(os.path.join(staging, name), final)
        finals.append(final)
    stats = _lift_stats(df.sparkSession, finals)
    new_files = [
        {"path": os.path.relpath(final, table), **st}
        for final, st in zip(finals, stats)
    ]
    for name in os.listdir(staging):  # leftovers (_SUCCESS etc.)
        os.unlink(os.path.join(staging, name))
    os.rmdir(staging)
    return new_files


def write_table(
    df: DataFrame,
    table: str,
    mode: str = "overwrite",
    max_retries: int = 3,
    extra: dict | None = None,
) -> dict:
    """Write ``df``'s rows as new data files and commit a snapshot.

    ``mode="overwrite"``: the new snapshot references only the new
    files. ``mode="append"``: new files plus every file of the current
    latest snapshot. Either way no existing file is touched — that is
    what makes old versions readable. Returns the committed snapshot.

    The data write itself goes through Spark (executors write parquet
    in parallel into a staging dir); the driver then moves the files
    to write-once unique names, lifts their footer stats, and runs the
    optimistic commit loop. A lost race re-derives the version AND the
    append base from the winner's snapshot before retrying."""
    import time as _time

    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    t0 = _time.time()
    new_files = _write_data_files(df, table)
    write_secs = round(_time.time() - t0, 3)

    schema_json = df.schema.json()
    for _ in range(max_retries):
        base_version = latest_version(table)
        files = list(new_files)
        if mode == "append" and base_version is not None:
            base = load_snapshot(table, base_version)
            if base["schema_json"] != schema_json:
                raise ValueError(
                    "append schema differs from the table's — schema "
                    "evolution is out of scope for this layer; overwrite "
                    "or migrate explicitly"
                )
            files = base["files"] + files
        version = (base_version or 0) + 1
        snap = {
            "format_version": FORMAT_VERSION,
            "version": version,
            "parent": base_version,
            "mode": mode,
            "schema": df.schema.simpleString(),
            "schema_json": schema_json,
            "files": files,
            "total_rows": sum(f["rows"] for f in files),
            # write-throughput metrics for the NEW files (north-rule:
            # metrics live in the manifest) — stamped before the atomic
            # publish, never edited after
            "write_seconds": write_secs,
            "new_rows": sum(f["rows"] for f in new_files),
            "rows_per_sec": (
                round(sum(f["rows"] for f in new_files) / write_secs, 2)
                if write_secs > 0
                else None
            ),
            **(extra or {}),
        }
        tmp = os.path.join(table, SNAP_DIR, f".v{version}-{uuid.uuid4().hex[:8]}.tmp")
        with open(tmp, "w") as f:
            json.dump(snap, f)
        try:
            # create-EXCLUSIVE publish: os.link fails with EEXIST if a
            # concurrent writer won this version — unlike os.replace,
            # which would silently clobber their commit
            os.link(tmp, _snap_path(table, version))
            os.unlink(tmp)
            return snap
        except FileExistsError:
            os.unlink(tmp)
            continue  # lost the race: re-derive base + version
    raise CommitConflict(
        f"lost the commit race {max_retries} times on {table} — "
        "a live writer is outpacing this one"
    )


def commit_stream_batch(df: DataFrame, table: str, batch_id: int) -> dict | None:
    """Exactly-once ``foreachBatch`` sink: append ``df`` as a new
    snapshot stamped with the Structured Streaming ``batch_id``.

    A replayed micro-batch (restart after a crash between the data
    write and the checkpoint commit) arrives with a batch_id ≤ the one
    recorded in the table's latest snapshot — detected here and turned
    into a no-op ``None``, so the table never double-appends. That is
    Iceberg's streaming-sink idempotence contract (snapshot summary
    carries the epoch id); it assumes ONE streaming writer per table —
    interleave other writers and the monotonic check is void (same
    restriction as Iceberg's single-committer-per-stream). The batch's
    data must itself be replay-deterministic, which Structured
    Streaming guarantees for replayable sources.

    The watermark is the MAX ``stream_batch_id`` across all retained
    snapshots, not just the latest: a maintenance commit (compact also
    carries the key forward, but e.g. a manual overwrite would not)
    must never reset the replay guard — losing it would let a replayed
    micro-batch double-append silently (ADVICE r05 medium)."""
    last = None
    for v in _list_versions(table):
        b = load_snapshot(table, v).get("stream_batch_id")
        if b is not None and (last is None or b > last):
            last = b
    if last is not None and batch_id <= last:
        return None  # replayed batch — already committed
    return write_table(
        df, table, mode="append", extra={"stream_batch_id": batch_id}
    )


def _overlaps(lo, hi, op: str, value) -> bool:
    if op == "=":
        return lo <= value <= hi
    if op == ">=":
        return hi >= value
    if op == "<=":
        return lo <= value
    if op == "between":
        vlo, vhi = value
        return lo <= vhi and hi >= vlo
    if op == "in":  # value: iterable of candidates (IVF probe sets etc.)
        return any(lo <= v <= hi for v in value)
    raise ValueError(f"unsupported prune op {op!r}")


def plan_files(
    table: str,
    version: int | None = None,
    prune: tuple[str, str, object] | None = None,
) -> tuple[dict, list[str]]:
    """Scan planning: (snapshot, file paths to read). ``prune`` is
    ``(column, op, value)`` with op ∈ {=, >=, <=, between}; files whose
    footer [min, max] for that column cannot contain a match are
    skipped WITHOUT touching them. Files lacking stats for the column
    are conservatively kept."""
    snap = load_snapshot(table, version)
    chosen = []
    for entry in snap["files"]:
        if prune is not None:
            col, op, value = prune
            s = entry.get("stats", {}).get(col)
            if s is not None and not _overlaps(s[0], s[1], op, value):
                continue
        chosen.append(os.path.join(table, entry["path"]))
    return snap, chosen


def read_table(
    spark: SparkSession,
    table: str,
    version: int | None = None,
    prune: tuple[str, str, object] | None = None,
) -> DataFrame:
    """Read a snapshot (latest by default; ``version=`` time-travels).
    ``prune`` cuts the file list via manifest stats before Spark plans
    the scan — the predicate itself must still be applied by the
    caller's ``.where`` (stats pruning is a superset guarantee, exactly
    like Iceberg's)."""
    snap, files = plan_files(table, version, prune)
    if not files:
        from pyspark.sql.types import StructType

        return spark.createDataFrame(
            [], StructType.fromJson(json.loads(snap["schema_json"]))
        )
    return spark.read.parquet(*files)


def compact(
    spark: SparkSession,
    table: str,
    target_rows: int = 1_000_000,
    max_retries: int = 3,
) -> dict | None:
    """Bin-pack small data files into ~``target_rows`` files and commit
    the result as a new snapshot — Iceberg's rewrite_data_files,
    the answer to the small-files problem that per-batch streaming
    commits accumulate (every ``commit_stream_batch`` adds a file; a
    year of micro-batches is 10^5 files whose open/plan overhead
    eventually dwarfs the data).

    Rewrites ONLY files with fewer than ``target_rows`` rows; row
    content is unchanged (same rows, fewer files) so readers see no
    data difference, and the PRE-compaction snapshot still
    time-travels to the original files until vacuum. Concurrency: the
    commit loop re-derives the latest snapshot each attempt and
    re-bases (latest files − compacted + new); if a concurrent
    overwrite/compaction removed any of the planned files, the
    compaction aborts with ``None`` rather than resurrecting them.
    Returns the committed snapshot, or None when there is nothing to
    do (fewer than two small files) or the base moved underneath."""
    snap = load_snapshot(table)
    small = [f for f in snap["files"] if f["rows"] < target_rows]
    if len(small) < 2:
        return None
    total = sum(f["rows"] for f in small)
    n_out = max(1, -(-total // target_rows))  # ceil
    paths = [os.path.join(table, f["path"]) for f in small]
    new_files = _write_data_files(
        spark.read.parquet(*paths).coalesce(n_out), table
    )
    small_set = {f["path"] for f in small}
    for _ in range(max_retries):
        base_version = latest_version(table)
        base = load_snapshot(table, base_version)
        base_paths = {f["path"] for f in base["files"]}
        if not small_set <= base_paths:
            return None  # a concurrent writer dropped some planned file
        files = [f for f in base["files"] if f["path"] not in small_set] + new_files
        version = base_version + 1
        snap_out = {
            "format_version": FORMAT_VERSION,
            "version": version,
            "parent": base_version,
            "mode": "compact",
            "schema": base["schema"],
            "schema_json": base["schema_json"],
            "files": files,
            "total_rows": sum(f["rows"] for f in files),
            "compacted": sorted(small_set),
        }
        # carry the streaming replay watermark through maintenance: a
        # compaction between a stream commit and its checkpoint must
        # not erase the batch-id guard, or the replayed batch would
        # double-append (exactly-once contract, ADVICE r05 medium)
        if base.get("stream_batch_id") is not None:
            snap_out["stream_batch_id"] = base["stream_batch_id"]
        tmp = os.path.join(table, SNAP_DIR, f".v{version}-{uuid.uuid4().hex[:8]}.tmp")
        with open(tmp, "w") as f:
            json.dump(snap_out, f)
        try:
            os.link(tmp, _snap_path(table, version))
            os.unlink(tmp)
            return snap_out
        except FileExistsError:
            os.unlink(tmp)
            continue
    raise CommitConflict(f"compaction lost the commit race {max_retries} times on {table}")


def vacuum(
    table: str, keep_versions: int = 1, orphan_grace_seconds: float = 3600.0
) -> list[str]:
    """Drop snapshots older than the newest ``keep_versions`` and
    delete data files no retained snapshot references. Returns deleted
    file paths. Time travel reaches only retained versions afterwards —
    the Iceberg expire-snapshots contract.

    Also sweeps TRUE orphans: files under ``data/`` referenced by NO
    snapshot at all (abandoned writes — a commit loop that lost the
    race ``max_retries`` times, or a crash between ``_write_data_files``
    and the commit leave staged-then-moved files that no manifest ever
    named; ADVICE r05). Those never age out via snapshot expiry, so
    without this sweep they leak forever. An ``orphan_grace_seconds``
    mtime threshold protects in-flight commits (files already moved to
    ``data/`` whose snapshot is about to be published) — Iceberg's
    remove_orphan_files has the identical ``older_than`` guard."""
    import time as _time

    versions = _list_versions(table)
    deleted: list[str] = []
    if len(versions) > keep_versions:
        keep, drop = versions[-keep_versions:], versions[:-keep_versions]
        referenced = set()
        for v in keep:
            for entry in load_snapshot(table, v)["files"]:
                referenced.add(entry["path"])
        for v in drop:
            for entry in load_snapshot(table, v)["files"]:
                rel = entry["path"]
                if rel not in referenced:
                    full = os.path.join(table, rel)
                    if os.path.exists(full):
                        os.unlink(full)
                    deleted.append(rel)
                    referenced.add(rel)  # don't double-delete across drops
            os.unlink(_snap_path(table, v))
    # orphan sweep: anything in data/ no RETAINED snapshot references
    # and old enough that no in-flight commit can still be about to
    # reference it
    retained_refs = set()
    for v in _list_versions(table):
        for entry in load_snapshot(table, v)["files"]:
            retained_refs.add(entry["path"])
    data_dir = os.path.join(table, "data")
    now = _time.time()
    if os.path.isdir(data_dir):
        for name in sorted(os.listdir(data_dir)):
            rel = os.path.join("data", name)
            full = os.path.join(data_dir, name)
            if rel in retained_refs or not os.path.isfile(full):
                continue
            if now - os.path.getmtime(full) < orphan_grace_seconds:
                continue  # possibly an in-flight commit's file
            os.unlink(full)
            deleted.append(rel)
    return deleted
