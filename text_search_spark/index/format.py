"""On-disk index layout + small helpers.

Layout under <index_dir>/ (all Parquet; Iceberg-style: immutable data files,
directory partitioning, an explicit JSON manifest committed last as the
atomicity point, and an append-only metrics table for lineage):

  segments/term_bucket=NN/   (term_id long, shard int, df_part long,
                              cf_part long, postings binary,
                              positions binary, blockmax binary,
                              bm_avgdl double)
      term_id = xxhash64(term) — the big build shuffle carries an int64
      key, never strings (~45% shuffle-volume cut); the query planner
      computes term_id driver-side (functions/xxhash.py), so lookups need
      no vocab join. Uniqueness term<->term_id is asserted at build.
      doc-sharded-within-term-partitioned posting segments. `shard` is a
      consistent hash of doc_id so every term's postings for a given doc
      land in the same shard -> query scoring is doc-sharded with no
      cross-term shuffle (see query.py).
  doc_stats/                 (doc_id long, url string, doc_len long)
  vocab/                     (term string, term_id long, term_bucket int)
      distinct terms (the dictionary) — built from a map-side-combined
      distinct pass, tiny next to the posting shuffle.
  term_stats/                (term string, term_id long, df long, cf long,
                              term_bucket int)
  metrics/                   (run_id, stage, unit, docs long, postings long,
                              bytes long, status, updated_at) — per-partition
      lineage + counters; append-only (north rule: metrics table).
  manifest.json              global stats + build config; written LAST.
      A build is complete iff the manifest exists and `complete` is true.
      checkpoints: per-stage completion markers for resume (stage name ->
      true) — segment-level checkpointing (SURVEY.md §7.1 M5).
"""

from __future__ import annotations

import json
import os
import re
import uuid
from dataclasses import asdict, dataclass, field
from typing import Callable, Dict, List, Optional


# v3: int64 term_id shuffle/segments + vocab table
# v4: tokens_tmp layout (doc_id, blob, term, term_bucket) — doc_len/tf fold
#     into a varbyte blob header, shard is an expression, never a column;
#     build_index refuses to RESUME a partial build from another version
FORMAT_VERSION = 4


@dataclass
class IndexManifest:
    format_version: int = 1  # explicitly set on save; old manifests lack it
    n_docs: int = 0
    total_tokens: int = 0
    avgdl: float = 0.0
    n_buckets: int = 32
    n_shards: int = 4
    k1: float = 1.2
    b: float = 0.75
    complete: bool = False
    run_id: str = ""
    stages: Dict[str, bool] = field(default_factory=dict)
    # JVM->Python pipe narrowing for the segment stage (build-transport
    # only — on-disk bytes are identical either way): when the corpus's
    # doc_id RANGE fits 31 bits (sequential/dense ingest ids), the pipe
    # carries int32 (doc_id - doc_id_base) instead of int64 doc_id.
    # Sparse 60-bit hashed ids auto-disable it. Persisted so a resumed
    # build re-runs the segment stage with the same transport.
    doc_id_base: int = 0
    doc_id_narrow: bool = False
    # resumable-unit layout: group g owns buckets range(g, n_buckets,
    # bucket_groups), and the 'segments:{g}' checkpoints are only valid
    # under the layout that wrote them — persisted so a resume cannot
    # silently skip buckets by re-deriving groups from a DIFFERENT
    # caller-supplied bucket_groups. 0 = unset (legacy partial).
    bucket_groups: int = 0
    # Iceberg-style snapshot: the COMMITTED segment file set, as paths
    # relative to segments_dir (e.g. "term_bucket=3/batch0-part-...").
    # Readers that honor this list get true snapshot isolation against
    # concurrent streaming appends — a part file an in-flight batch has
    # already landed is invisible until the manifest flip commits it
    # (closes the torn-read seam incremental.py documented through
    # round 4). None = legacy manifest: readers fall back to the
    # directory scan. At 10^12-doc scale this list lives in Iceberg
    # manifest-list files rather than one JSON array; the commit
    # protocol (file set flips with the snapshot pointer) is identical.
    # Paths always use '/' separators regardless of OS (normalized on
    # write; converted to os-native only at open time) so a manifest
    # written on one OS reads on another.
    segment_files: Optional[List[str]] = None
    # Optimistic-commit snapshot protocol (round-6): every committed
    # manifest state carries a monotonically increasing snapshot_id and
    # is ALSO persisted as snapshots/v{sid}.json. commit_manifest()
    # claims v{sid+1} with an atomic hardlink (fails if another writer
    # claimed it first) and rebases+retries on conflict — so a
    # compaction racing a streaming append can never clobber the
    # other's file list (Iceberg optimistic CAS, index/merge.py).
    # manifest.json is a pointer/cache: load_manifest always checks the
    # snapshots dir for a newer claimed snapshot (covers a crash
    # between claim and pointer update).
    snapshot_id: int = 0
    # When the file list outgrows SEGMENT_FILES_INLINE_MAX it is
    # sharded into per-bucket JSON sidecars under filelists/<token>/
    # (the Iceberg manifest-list shape): manifest.json stays O(1) in
    # the file count, and a bucket-scoped reader can load just its
    # bucket's list. segment_files_ref holds the index_dir-relative
    # sidecar dir; segment_files is then null IN THE JSON but always
    # populated in memory by load_manifest.
    segment_files_ref: Optional[str] = None
    # Document deletes (Lucene/Iceberg tombstone shape): index_dir-
    # relative parquet files (column: doc_id long), '/'-normalized.
    # Readers exclude the union of these doc_ids from every result
    # immediately; corpus statistics (df/cf/n_docs/avgdl — hence
    # surviving docs' scores) keep the full-corpus values until
    # compact_in_place purges the postings physically and clears this
    # list (exactly Lucene's deleted-docs contract; block-max bounds
    # stay valid upper bounds in between). None == [] == no deletes.
    tombstone_files: Optional[List[str]] = None
    # doc_stats is snapshot-tracked exactly like segments (round-6b,
    # review finding: the purge's former in-place dir swap could
    # destroy a racing append's landing doc_stats files): paths
    # relative to doc_stats_dir, '/'-normalized; the purge lands
    # compactN- replacement files next to the old ones and this list
    # flips with the commit, so pinned time-travel readers keep a
    # consistent doc_stats view until vacuum. None = legacy dir scan.
    # Externalized to a filelists/ sidecar past the same inline cap as
    # segment_files (a 10k-batch stream would otherwise bloat every
    # manifest JSON); doc_stats_files_ref mirrors segment_files_ref.
    doc_stats_files: Optional[List[str]] = None
    doc_stats_files_ref: Optional[str] = None
    # incremental term_stats (round-7, VERDICT item 7): per-batch df/cf
    # delta files under term_stats_deltas/, '/'-normalized relative
    # paths. The committed term_stats view = base table (+) sum of
    # these deltas, so streamed appends no longer go through
    # rebuild_term_stats's full segment scan; a rebuild folds the
    # deltas it consumed back into the base and clears them. None/[] =
    # base table is the whole view (batch builds, post-rebuild).
    term_stats_delta_files: Optional[List[str]] = None


# file lists at most this long are inlined in manifest.json; longer
# lists go to per-bucket sidecar files (tests lower this to exercise
# the sharded path at small scale)
SEGMENT_FILES_INLINE_MAX = 512

_BUCKET_PREFIX_RE = re.compile(r"^term_bucket=(\d+)/")


def manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, "manifest.json")


def snapshots_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "snapshots")


def filelists_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "filelists")


def _snapshot_path(index_dir: str, sid: int) -> str:
    return os.path.join(snapshots_dir(index_dir), f"v{sid:012d}.json")


class CommitBackend:
    """Storage seam for the snapshot-commit protocol (round-7, VERDICT
    item 6). The CAS protocol needs exactly three primitives beyond
    plain reads, and any store that provides them with the stated
    atomicity can host the COMMIT METADATA (snapshots/ + the
    manifest.json pointer):

      claim(path, payload) -> bool : atomic create-if-absent of the
          full payload — THE commit point; False = another writer got
          there first. Local FS: tmp file + os.link (EEXIST = lost).
          S3: `PUT If-None-Match: *` (HTTP 412 = lost; conditional
          writes GA Aug 2024). GCS: `x-goog-if-generation-match: 0`.
          Azure Blob: `If-None-Match: *`. Stores without a conditional
          PUT front the claim with a lock row (DynamoDB attribute_
          not_exists / etcd txn), as pre-2024 Iceberg S3 did.
      put(path, payload)           : durable last-write-wins write —
          only the best-effort pointer uses it. Local: tmp +
          os.replace. Object store: plain PUT.
      list_snapshot_ids(dir) -> [int] : claimed snapshot ids (LIST by
          prefix). S3/GCS LIST is strongly consistent (since 2020);
          a stale list on a weaker store only makes a reader fall
          back to the pointer state — never corrupts a commit.

    read/delete are plain per-object ops, included so the protocol
    touches the metadata store ONLY through this interface (enforced
    by the mock-backed tests in tests/test_commit_protocol.py).

    Deliberately OUT of scope: segment/doc_stats/tombstone data files
    and filelist sidecars. Those are immutable write-once-then-
    referenced Parquet/JSON that Spark itself reads and writes via
    Hadoop FileSystems — pointing an index at s3a:// makes the data
    plane work out of the box; only this metadata seam needs the
    conditional-write mapping above."""

    def claim(self, path: str, payload: str) -> bool:
        raise NotImplementedError

    def put(self, path: str, payload: str) -> None:
        raise NotImplementedError

    def read(self, path: str) -> Optional[str]:
        raise NotImplementedError

    def delete(self, path: str) -> None:
        raise NotImplementedError

    def list_snapshot_ids(self, snap_dir: str) -> List[int]:
        raise NotImplementedError


class LocalFSCommitBackend(CommitBackend):
    """Default backend: POSIX rename/link atomicity."""

    def claim(self, path: str, payload: str) -> bool:
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            f.write(payload)
        try:
            os.link(tmp, path)
        except FileExistsError:
            return False
        finally:
            os.remove(tmp)
        return True

    def put(self, path: str, payload: str) -> None:
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(payload)
        os.replace(tmp, path)

    def read(self, path: str) -> Optional[str]:
        try:
            with open(path) as f:
                return f.read()
        except FileNotFoundError:
            return None

    def delete(self, path: str) -> None:
        try:
            os.remove(path)
        except FileNotFoundError:
            pass

    def list_snapshot_ids(self, snap_dir: str) -> List[int]:
        if not os.path.isdir(snap_dir):
            return []
        return sorted(
            int(m.group(1))
            for f in os.listdir(snap_dir)
            if (m := re.fullmatch(r"v(\d+)\.json", f))
        )


_BACKEND: CommitBackend = LocalFSCommitBackend()


def set_commit_backend(b: CommitBackend) -> CommitBackend:
    """Swap the metadata backend (returns the previous one). Production
    code never calls this — it is the injection point for the
    mock-backend protocol tests and the documented hook an object-store
    deployment would use."""
    global _BACKEND
    prev = _BACKEND
    _BACKEND = b
    return prev


def try_claim_pid_lock(lock: str) -> bool:
    """Atomically claim a pid@host lock file (O_CREAT|O_EXCL — the same
    local-FS atomicity class as the CAS snapshot claim; an object-store
    backend would claim via conditional PUT). Returns False when the
    lock is held by a LIVE owner (or one we cannot verify: another
    host, alive under another uid, unreadable).

    Stale-lock recovery keeps the crash-rerun contract: if the recorded
    host matches and the pid is dead, the stale lock is broken via an
    atomic RENAME to a unique name — never os.remove — so when several
    processes judge the same dead owner stale, exactly one wins the
    break (the losers' replace fails, source gone) and O_EXCL then
    decides the claim; with remove, a slow breaker could delete the
    winner's freshly-claimed lock and both would run (round-8, ADVICE
    fix). Shared by compaction (.compact{gen}.lock, merge.py) and
    term_stats maintenance (.term_stats.lock, streaming/incremental)."""
    import socket

    me = f"{os.getpid()}@{socket.gethostname()}"
    for attempt in (0, 1):
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            try:
                os.write(fd, me.encode())
            finally:
                os.close(fd)
            return True
        except FileExistsError:
            if attempt == 1:
                return False
            stale = False
            try:
                with open(lock, "r") as fh:
                    pid_s, _, host = fh.read().strip().partition("@")
                if host == socket.gethostname() and pid_s.isdigit():
                    try:
                        os.kill(int(pid_s), 0)
                    except ProcessLookupError:
                        stale = True  # same host, owner dead: crashed
                    except PermissionError:
                        pass  # alive under another uid
            except OSError:
                pass  # unreadable/vanished: retry the claim once
            if not stale:
                return False
            broken = f"{lock}.broken-{os.getpid()}-{uuid.uuid4().hex[:8]}"
            try:
                os.replace(lock, broken)
                os.remove(broken)
            except FileNotFoundError:
                pass
    return False


def _read_json(path: str) -> Optional[dict]:
    raw = _BACKEND.read(path)
    return None if raw is None else json.loads(raw)


def list_snapshot_ids(index_dir: str) -> List[int]:
    """Sorted claimed snapshot ids (backend-routed; [] = none)."""
    return _BACKEND.list_snapshot_ids(snapshots_dir(index_dir))


def read_snapshot_dict(index_dir: str, sid: int) -> Optional[dict]:
    """Raw dict of a claimed snapshot (backend-routed; None = never
    claimed or expired)."""
    return _read_json(_snapshot_path(index_dir, sid))


def latest_snapshot_id(index_dir: str) -> int:
    """Highest claimed snapshot id (0 = none)."""
    ids = list_snapshot_ids(index_dir)
    return ids[-1] if ids else 0


def _manifest_from_dict(index_dir: str, d: dict) -> IndexManifest:
    m = IndexManifest(**d)
    if m.doc_stats_files_ref is not None and m.doc_stats_files is None:
        ref = os.path.join(
            index_dir, m.doc_stats_files_ref.replace("/", os.sep)
        )
        with open(ref) as fh:
            m.doc_stats_files = sorted(json.load(fh))
    if m.segment_files_ref is not None and m.segment_files is None:
        # reconstitute the sharded file list from the per-bucket
        # sidecars (missing dir = empty snapshot was externalized,
        # which the writer never does — treat as corrupt loudly)
        ref = os.path.join(index_dir, m.segment_files_ref)
        files: List[str] = []
        for f in sorted(os.listdir(ref)):
            if f.endswith(".json"):
                with open(os.path.join(ref, f)) as fh:
                    files.extend(json.load(fh))
        m.segment_files = sorted(files)
    return m


def load_manifest(index_dir: str) -> Optional[IndexManifest]:
    """Current committed snapshot: manifest.json, unless the snapshots
    dir holds a NEWER claimed snapshot (a committer crashed between
    its claim — the real commit point — and the pointer update)."""
    d = _read_json(manifest_path(index_dir))
    m = _manifest_from_dict(index_dir, d) if d is not None else None
    latest = latest_snapshot_id(index_dir)
    if latest > (m.snapshot_id if m is not None else 0):
        # the snapshot listed a moment ago may have been expired by a
        # concurrent expire_snapshots between latest_snapshot_id() and
        # this read — fall back to the pointer manifest instead of
        # IndexManifest(**None) (same None-guard snapshot_history and
        # vacuum_segments already apply)
        sd = read_snapshot_dict(index_dir, latest)
        if sd is not None:
            m = _manifest_from_dict(index_dir, sd)
    return m


def _externalize_file_list(index_dir: str, m: IndexManifest) -> dict:
    """Serialize m for commit: if the file list is large, write it as
    per-bucket sidecar JSONs and null it in the returned dict. The
    sidecar dir is content-addressed by a fresh token, written fully
    BEFORE the snapshot claim references it (orphans from a lost CAS
    race are expired with their snapshots)."""
    d = asdict(m)
    ds_files = m.doc_stats_files
    if ds_files is not None and len(ds_files) > SEGMENT_FILES_INLINE_MAX:
        token_ds = uuid.uuid4().hex[:12]
        ref_ds_dir = os.path.join(index_dir, "filelists")
        os.makedirs(ref_ds_dir, exist_ok=True)
        tmp = os.path.join(ref_ds_dir, f".tmp-docstats-{token_ds}.json")
        with open(tmp, "w") as fh:
            json.dump(sorted(ds_files), fh)
        os.replace(
            tmp, os.path.join(ref_ds_dir, f"docstats-{token_ds}.json")
        )
        d["doc_stats_files"] = None
        d["doc_stats_files_ref"] = f"filelists/docstats-{token_ds}.json"
        m.doc_stats_files_ref = d["doc_stats_files_ref"]
    else:
        d["doc_stats_files_ref"] = None
    files = m.segment_files
    if files is None or len(files) <= SEGMENT_FILES_INLINE_MAX:
        d["segment_files_ref"] = None
        return d
    token = uuid.uuid4().hex[:12]
    ref = f"filelists/{token}"
    ref_abs = os.path.join(index_dir, ref)
    os.makedirs(ref_abs, exist_ok=True)
    by_bucket: Dict[int, List[str]] = {}
    for p in files:
        mb = _BUCKET_PREFIX_RE.match(p)
        by_bucket.setdefault(int(mb.group(1)) if mb else -1, []).append(p)
    for b, plist in by_bucket.items():
        tmp = os.path.join(ref_abs, f".tmp-bucket-{b:05d}.json")
        with open(tmp, "w") as f:
            json.dump(sorted(plist), f)
        os.replace(tmp, os.path.join(ref_abs, f"bucket-{b:05d}.json"))
    d["segment_files"] = None
    d["segment_files_ref"] = ref
    m.segment_files_ref = ref
    return d


def _write_pointer(index_dir: str, payload: dict, sid: int) -> None:
    """Best-effort manifest.json pointer update: skip if the pointer is
    already at a newer snapshot (a slower CAS winner must not regress
    it; the benign remaining race is covered by load_manifest's
    snapshots-dir scan)."""
    p = manifest_path(index_dir)
    try:
        cur = _read_json(p)
        if cur is not None and cur.get("snapshot_id", 0) >= sid:
            return
    except (json.JSONDecodeError, OSError):
        pass
    _BACKEND.put(p, json.dumps(payload, indent=2))


def save_manifest(index_dir: str, m: IndexManifest) -> None:
    """Unconditional last-write-wins save — the SINGLE-writer path
    (batch build stage checkpoints, test rewinds). Bumps snapshot_id
    past every claimed snapshot so the saved state is what
    load_manifest returns. The state is persisted to snapshots/ via the
    same claim protocol as commit_manifest — every committed state is
    part of time-travel history (load_snapshot / snapshot_history) —
    but unlike commit_manifest it never rebases: losing a claim just
    re-bumps the id and claims the next one (last-write-wins)."""
    if m.segment_files is not None:
        m.segment_files = [p.replace(os.sep, "/") for p in m.segment_files]
    if m.tombstone_files is not None:
        m.tombstone_files = [
            p.replace(os.sep, "/") for p in m.tombstone_files
        ]
    if m.doc_stats_files is not None:
        m.doc_stats_files = [
            p.replace(os.sep, "/") for p in m.doc_stats_files
        ]
    while True:
        m.snapshot_id = (
            max(m.snapshot_id, latest_snapshot_id(index_dir)) + 1
        )
        payload = _externalize_file_list(index_dir, m)
        if _BACKEND.claim(
            _snapshot_path(index_dir, m.snapshot_id),
            json.dumps(payload, indent=2),
        ):
            break
    _write_pointer(index_dir, payload, m.snapshot_id)


def load_snapshot(
    index_dir: str, snapshot_id: int
) -> Optional[IndexManifest]:
    """Time travel: load a specific claimed snapshot (None if it was
    never claimed or has been expired by expire_snapshots). The
    returned manifest describes the index AS OF that commit; its data
    files remain readable until vacuum_segments expires them — the
    Iceberg read-older-snapshot contract."""
    d = read_snapshot_dict(index_dir, snapshot_id)
    if d is None:
        return None
    return _manifest_from_dict(index_dir, d)


def snapshot_history(index_dir: str) -> List[dict]:
    """Newest-last summaries of every retained claimed snapshot:
    {snapshot_id, n_docs, n_shards, n_files, stages}. The audit /
    time-travel catalog surface (Iceberg's snapshots metadata table);
    bounded by expire_snapshots."""
    out: List[dict] = []
    for sid in list_snapshot_ids(index_dir):
        j = read_snapshot_dict(index_dir, sid)
        if j is None:  # expired between list and read
            continue
        files = j.get("segment_files")
        out.append(
            {
                "snapshot_id": sid,
                "n_docs": j.get("n_docs"),
                "n_shards": j.get("n_shards"),
                "n_files": (
                    len(files)
                    if files is not None
                    else None  # sharded sidecar list — count on demand
                ),
                "complete": j.get("complete"),
                "stages": sorted(j.get("stages") or {}),
            }
        )
    return out


class CommitConflict(RuntimeError):
    """commit_manifest exhausted its CAS retries."""


def commit_manifest(
    index_dir: str,
    mutate: Callable[[IndexManifest], Optional[bool]],
    max_retries: int = 20,
) -> IndexManifest:
    """Optimistic-CAS manifest commit (Iceberg-style; closes the
    single-writer caveat that round-5 compact_in_place documented).

    mutate(man) is called on a FRESHLY loaded manifest (a new one if
    none exists) and mutates it in place; return False to abort (the
    state is already committed — e.g. an at-least-once redelivery of a
    committed micro-batch). mutate MUST be written as a rebase: it may
    run several times, each time against the then-latest snapshot.

    Claim protocol: the new state is fully written to a tmp file, then
    hardlinked onto snapshots/v{sid+1}.json — os.link is atomic and
    fails with EEXIST if another writer claimed that sid first, in
    which case we reload and re-run mutate (rebase) and retry. The
    claim IS the commit point: a crash after it is already durable
    (load_manifest prefers the newest claimed snapshot); the
    manifest.json pointer update after it is best-effort."""
    for _ in range(max_retries):
        man = load_manifest(index_dir)
        if man is None:
            man = IndexManifest(format_version=FORMAT_VERSION)
        if mutate(man) is False:
            return man
        sid = man.snapshot_id + 1
        man.snapshot_id = sid
        if man.segment_files is not None:
            man.segment_files = [
                p.replace(os.sep, "/") for p in man.segment_files
            ]
        if man.tombstone_files is not None:
            man.tombstone_files = [
                p.replace(os.sep, "/") for p in man.tombstone_files
            ]
        if man.doc_stats_files is not None:
            man.doc_stats_files = [
                p.replace(os.sep, "/") for p in man.doc_stats_files
            ]
        payload = _externalize_file_list(index_dir, man)
        if not _BACKEND.claim(
            _snapshot_path(index_dir, sid), json.dumps(payload, indent=2)
        ):
            continue  # lost the race — rebase onto the winner and retry
        _write_pointer(index_dir, payload, sid)
        return man
    raise CommitConflict(
        f"gave up after {max_retries} CAS attempts at {index_dir}"
    )


def expire_snapshots(
    index_dir: str, retain_last: int = 2, sidecar_grace_s: float = 3600.0
) -> int:
    """Drop snapshot history older than the last `retain_last` claimed
    snapshots, plus filelist sidecars no retained snapshot (or the
    pointer) references. Bounds snapshots/ + filelists/ growth; run
    with (or after) vacuum_segments. Returns files removed.

    sidecar_grace_s: filelist sidecar dirs YOUNGER than this are kept
    even when unreferenced — commit_manifest/save_manifest write the
    sidecar fully BEFORE the snapshot claim references it, so an
    expirer racing an in-flight commit would otherwise delete the dir
    the imminent claim points at and leave that snapshot unreadable
    (same landing-window guard as vacuum_segments' grace). Pass 0 only
    when no writer can be active."""
    assert retain_last >= 1
    removed = 0
    sids = list_snapshot_ids(index_dir)
    keep_sids = set(sids[-retain_last:])
    live_refs = set()

    def _collect_refs(j: Optional[dict]) -> None:
        for k in ("segment_files_ref", "doc_stats_files_ref"):
            ref = (j or {}).get(k)
            if ref:
                live_refs.add(ref)

    for sid in keep_sids:
        _collect_refs(read_snapshot_dict(index_dir, sid))
    _collect_refs(_read_json(manifest_path(index_dir)))
    for sid in sids:
        if sid not in keep_sids:
            _BACKEND.delete(_snapshot_path(index_dir, sid))
            removed += 1
    fl = filelists_dir(index_dir)
    if os.path.isdir(fl):
        import shutil
        import time as _time

        cutoff = _time.time() - sidecar_grace_s
        for tok in os.listdir(fl):
            tok_path = os.path.join(fl, tok)
            if f"filelists/{tok}" in live_refs:
                continue
            if sidecar_grace_s > 0 and os.path.getmtime(tok_path) > cutoff:
                continue  # possibly an in-flight commit's landing sidecar
            if os.path.isdir(tok_path):
                shutil.rmtree(tok_path, ignore_errors=True)
            else:
                os.remove(tok_path)  # docstats-*.json sidecar file
            removed += 1
    return removed


# read-side schema of the segments table (data columns + the term_bucket
# partition column). Passed explicitly wherever segments are read so an
# EMPTY index (every doc tokenized to zero tokens -> zero segment files)
# reads as an empty DataFrame instead of failing schema inference.
SEG_READ_SCHEMA = (
    "term_id long, shard int, df_part long, cf_part long, "
    "postings binary, positions binary, blockmax binary, "
    "bm_avgdl double, term_bucket int"
)


VOCAB_READ_SCHEMA = "term string, term_id long, term_bucket int"

# same explicit-schema discipline for the stats tables: a streaming-built
# index has no term_stats until rebuild_term_stats runs, and an all-blank
# corpus writes empty dirs — inference over zero files throws where an
# empty relation is the correct answer.
DOC_STATS_READ_SCHEMA = "doc_id long, url string, doc_len int"
TERM_STATS_READ_SCHEMA = (
    "term string, term_id long, df long, cf long, term_bucket int"
)


def list_segment_files(index_dir: str) -> List[str]:
    """Walk segments_dir and return sorted segments_dir-relative paths of
    every .parquet part file — used by writers at COMMIT time to record
    the snapshot's file set in the manifest (readers never walk)."""
    return _list_parquet_files(segments_dir(index_dir))


def list_doc_stats_files(index_dir: str) -> List[str]:
    """Same walk over doc_stats_dir (doc_stats is snapshot-tracked the
    same way as segments)."""
    return _list_parquet_files(doc_stats_dir(index_dir))


def _list_parquet_files(root: str) -> List[str]:
    out: List[str] = []
    if not os.path.isdir(root):
        return out
    for d, _dirs, files in os.walk(root):
        rel = os.path.relpath(d, root)
        # never snapshot committer staging (a crashed job's _temporary
        # tree also holds .parquet files) or hidden/_ metadata files
        if rel != "." and any(
            p.startswith(("_", ".")) for p in rel.split(os.sep)
        ):
            continue
        rel = rel.replace(os.sep, "/")  # manifest paths are always '/'
        for f in files:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                out.append(f if rel == "." else f"{rel}/{f}")
    return sorted(out)


def committed_files_legacy(index_dir: str, stages: Dict[str, bool]) -> List[str]:
    """Directory-walk fallback for PRE-snapshot manifests
    (segment_files=None): the segment part files a COMMITTED stage
    owns — untagged files (the initial batch build), `batchN-` files
    with `stream:N` committed, `compactN-` files with `compact:N`
    committed. Orphans from a crashed never-committed batch or
    compaction attempt are excluded instead of silently adopted."""

    return [
        p
        for p in list_segment_files(index_dir)
        if _stage_committed(p, stages)
    ]


def _stage_committed(p: str, stages: Dict[str, bool]) -> bool:
    base = os.path.basename(p)
    mb = re.match(r"batch(\d+)-", base)
    if mb:
        return bool(stages.get(f"stream:{mb.group(1)}"))
    mc = re.match(r"compact(\d+)-", base)
    if mc:
        return bool(stages.get(f"compact:{mc.group(1)}"))
    return True


def committed_doc_stats_legacy(
    index_dir: str, stages: Dict[str, bool]
) -> List[str]:
    """committed_files_legacy for the doc_stats table (legacy manifests
    with doc_stats_files=None)."""
    return [
        p
        for p in list_doc_stats_files(index_dir)
        if _stage_committed(p, stages)
    ]


def segments_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "segments")


def doc_stats_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "doc_stats")


def term_stats_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "term_stats")


def term_stats_deltas_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "term_stats_deltas")


def tombstones_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "tombstones")


def metrics_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "metrics")


# Parquet row-group byte target for segment files (all writers). The
# sidecar point read prunes row groups by term_id min/max; a large
# write partition left at the 128 MB writer default lands 100+ MB row
# groups and every single-term read then pulls a whole postings column
# chunk (measured at 1M docs: post-compaction cold p50 374 ms -> 202 ms
# after bounding this; BENCH.md round-7). Bulk scans are unaffected —
# files.maxPartitionBytes coalesces row groups per task.
SEGMENT_ROW_GROUP_BYTES = 8 * 1024 * 1024

SEGMENT_SCHEMA = (
    "term_id long, shard int, df_part long, cf_part long, "
    "postings binary, positions binary, blockmax binary, bm_avgdl double"
)


def vocab_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "vocab")
