"""`.sidp` span-container format: a real custom source/sink through the
public PySpark Python DataSource API.

The reference's sink serializes each deduped item into an `.idp` container
record — base name, target name, a 13-slot size header, then the delta
instruction arrays and the residual payload, streamed through a write
cache into one append-only shard (``/root/reference/idedup.c:455-516``,
cache ``idedup.c:340-363``); restore re-parses those records
(``main.c:338-365``). SURVEY §2.1 maps items 16-17 (residual/instruction
compression) to Parquet+ZSTD by design — that remains the production
answer. This module *additionally* implements the container itself as a
first-class Spark format, so the engine has a native read/write path for
the reference's artifact shape:

* record = one (base, target) delta group: ``id_a, id_b, n_instr``, the
  packed instruction array ``(instr_id, kind, a_off, b_off, length,
  payload_len)`` and the concatenated INSERT payload blob — the analog of
  ``copy_x/copy_y/copy_l/insert_l`` + residual (``idedup.c:495-516``);
* record body is zlib-compressed (stdlib) — the stand-in for the
  reference's FSE instruction-stream compression (``COMPRESS_DELTA_INS``,
  ``idedup.c:499-515``); per-record, so a shard is splittable by record
  walk without global state;
* shard = magic ``SIDP`` + version byte + records, written append-only
  per task (the write-cache analog is the OS page cache + one final
  fsync-free close; Spark's task commit protocol replaces fsync);
* commit manifest ``_SIDP_MANIFEST.json`` is written by the DRIVER after
  all tasks report their shards (write-after-data ordering, same
  discipline as ``pipeline.py``'s ``_LINEAGE.json`` and streaming's epoch
  manifests): readers list shards from the manifest only, so a killed
  write — even one that left orphan shard files — is invisible.
  ``mode("append")`` is atomic at manifest granularity for writers on
  one host (the commit's read-modify-write holds an flock); concurrent
  writers across hosts need a catalog commit — the Iceberg mapping.

Scale shape: one ``InputPartition`` per shard → scan parallelism equals
shard count (tasks are independent, no footer/index needed); records
decode streaming per shard, never whole-shard buffering beyond one
record. The manifest carries per-shard ``[min, max]`` id stats (the
Parquet row-group min/max analog) and the reader implements
``pushFilters``: simple id predicates prune whole shards before any
task launches, while every filter is also returned to Spark for
row-level re-application — pruning can only skip work, never change
results. Write sorted/range-partitioned by id (``repartitionByRange``)
and point lookups touch one shard. Writes are executor-local and embarrassingly parallel; the only
driver work is the O(#shards) manifest. Exact-row roundtrip
(``read(write(df)) == df`` as a multiset) is pytest-gated, including
append/overwrite semantics and orphan-shard invisibility.

Usage::

    from imdedup_plus_spark.container import SpanContainerDataSource
    spark.dataSource.register(SpanContainerDataSource)
    spans.write.format("sidp").mode("overwrite").save(path)
    spark.read.format("sidp").load(path)      # SPAN_SCHEMA rows
"""

from __future__ import annotations

import json
import os
import struct
import uuid
import zlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

MAGIC = b"SIDP"
VERSION = 1
MANIFEST = "_SIDP_MANIFEST.json"

#: the span row shape this format stores (spans.SPAN_SCHEMA, long ids)
SIDP_SCHEMA = (
    "id_a long, id_b long, instr_id int, kind string, "
    "a_off int, b_off int, length int, payload string"
)

_KIND_CODE = {"COPY": 0, "INSERT": 1}
_CODE_KIND = {v: k for k, v in _KIND_CODE.items()}

#: per-instruction fixed part: instr_id u32, kind u8, a_off i32, b_off i32,
#: length i32, payload_len u32 (little-endian, like the repo's packed
#: shingle sets)
_INSTR = struct.Struct("<IBiiiI")
#: record header: id_a i64, id_b i64, n_instr u32, body_comp_len u32,
#: body_raw_len u32
_RECHDR = struct.Struct("<qqIII")


#: kind byte: low bits = COPY/INSERT code, high bit = payload IS NULL —
#: null and empty-string payloads are distinct on disk, so roundtrip is
#: exact for EVERY row the schema admits, not just the shapes the span
#: kernels happen to emit
_NULL_PAYLOAD_BIT = 0x80


def _pack_record(id_a: int, id_b: int, instrs: list[tuple]) -> bytes:
    """instrs: (instr_id, kind, a_off, b_off, length, payload_str|None)."""
    parts, blob = [], []
    for instr_id, kind, a_off, b_off, length, payload in instrs:
        p = payload.encode("utf-8") if payload is not None else b""
        code = _KIND_CODE[kind] | (_NULL_PAYLOAD_BIT if payload is None else 0)
        parts.append(
            _INSTR.pack(instr_id, code, a_off or 0, b_off or 0,
                        length or 0, len(p))
        )
        blob.append(p)
    raw = b"".join(parts) + b"".join(blob)
    comp = zlib.compress(raw, 6)
    return _RECHDR.pack(id_a, id_b, len(instrs), len(comp), len(raw)) + comp


def _parse_record_body(raw: bytes, n_instr: int):
    instrs = []
    blob_off = _INSTR.size * n_instr
    for i in range(n_instr):
        instr_id, code, a_off, b_off, length, p_len = _INSTR.unpack_from(
            raw, i * _INSTR.size
        )
        payload = (
            None
            if code & _NULL_PAYLOAD_BIT
            else raw[blob_off : blob_off + p_len].decode("utf-8")
        )
        blob_off += p_len
        instrs.append(
            (instr_id, _CODE_KIND[code & ~_NULL_PAYLOAD_BIT], a_off, b_off,
             length, payload)
        )
    return instrs


def _iter_records_stream(fh, path: str):
    """Yield (id_a, id_b, [(instr_id, kind, a_off, b_off, length,
    payload)]) streaming record-at-a-time from an open shard — memory is
    bounded by the largest single record, never the shard; loud on
    corruption or truncation."""
    head = fh.read(5)
    if head[:4] != MAGIC:
        raise ValueError(f"not a SIDP shard (bad magic): {path}")
    if head[4] != VERSION:
        raise ValueError(f"unsupported SIDP version {head[4]}: {path}")
    pos = 5
    while True:
        hdr = fh.read(_RECHDR.size)
        if not hdr:
            return
        if len(hdr) < _RECHDR.size:
            raise ValueError(f"truncated record header at {pos}: {path}")
        id_a, id_b, n_instr, comp_len, raw_len = _RECHDR.unpack(hdr)
        pos += _RECHDR.size
        comp = fh.read(comp_len)
        if len(comp) < comp_len:
            raise ValueError(f"truncated record body at {pos}: {path}")
        raw = zlib.decompress(comp)
        if len(raw) != raw_len:
            raise ValueError(f"record length mismatch at {pos}: {path}")
        pos += comp_len
        yield id_a, id_b, _parse_record_body(raw, n_instr)


def _iter_records(data: bytes, path: str):
    """In-memory twin of ``_iter_records_stream`` (tests, small blobs)."""
    import io

    yield from _iter_records_stream(io.BytesIO(data), path)


def _read_manifest(path: str) -> dict:
    mp = os.path.join(path, MANIFEST)
    if not os.path.exists(mp):
        return {"shards": [], "n_records": 0}
    with open(mp) as fh:
        return json.load(fh)


class _ShardPartition(InputPartition):
    def __init__(self, shard: str):
        self.shard = shard


#: id columns whose per-shard [min, max] the manifest records — the
#: pruning stats (the Parquet row-group min/max analog for this format)
_STAT_COLS = ("id_a", "id_b")


def _shard_survives(stats: dict, filters: list) -> bool:
    """Conjunctive shard-level interval check: a shard is skippable iff
    ANY pushed filter is unsatisfiable over the shard's [min, max] for
    that id column. Conservative by construction — unknown stats keep
    the shard, and Spark re-applies every filter row-level."""
    for f in filters:
        col = f.attribute[0]
        b = stats.get(col)
        if not b:
            continue
        lo, hi = b
        if isinstance(f, EqualTo) and not (lo <= f.value <= hi):
            return False
        if isinstance(f, GreaterThan) and not (hi > f.value):
            return False
        if isinstance(f, GreaterThanOrEqual) and not (hi >= f.value):
            return False
        if isinstance(f, LessThan) and not (lo < f.value):
            return False
        if isinstance(f, LessThanOrEqual) and not (lo <= f.value):
            return False
        if isinstance(f, In) and not any(lo <= v <= hi for v in f.value):
            return False
    return True


class _SidpReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("sidp reader requires a path")
        self._filters: list = []

    def pushFilters(self, filters):
        """Shard pruning via manifest min/max stats. Every filter is
        returned as unhandled — Spark re-applies them row-level, so
        pruning can only skip work, never change results; only simple
        numeric comparisons on the id columns participate."""
        for f in filters:
            if (
                isinstance(
                    f,
                    (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan,
                     LessThanOrEqual, In),
                )
                and len(f.attribute) == 1
                and f.attribute[0] in _STAT_COLS
                and _filter_values_numeric(f)
            ):
                self._filters.append(f)
        return filters

    def partitions(self):
        shards = _read_manifest(self.path)["shards"]
        if self._filters:
            shards = [
                s for s in shards
                if _shard_survives(s.get("stats", {}), self._filters)
            ]
        # one task per surviving shard; zero shards -> a single sentinel
        # no-op partition (Spark requires at least one)
        if not shards:
            return [_ShardPartition("")]
        return [_ShardPartition(s["name"]) for s in shards]

    def read(self, partition):
        if not partition.shard:
            return
        with open(os.path.join(self.path, partition.shard), "rb") as fh:
            for id_a, id_b, instrs in _iter_records_stream(fh, partition.shard):
                for instr_id, kind, a_off, b_off, length, payload in instrs:
                    yield (
                        id_a, id_b, instr_id, kind, a_off, b_off, length, payload
                    )


def _filter_values_numeric(f) -> bool:
    vals = f.value if isinstance(f, In) else (f.value,)
    return all(isinstance(v, int) and not isinstance(v, bool) for v in vals)


class _SidpCommitMessage(WriterCommitMessage):
    def __init__(self, shard: str, n_records: int, stats: dict | None = None):
        self.shard = shard
        self.n_records = n_records
        self.stats = stats or {}


class _SidpWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("sidp writer requires a path")
        self.overwrite = overwrite

    def write(self, iterator):
        """One shard per non-empty task. Rows of the same (id_a, id_b)
        arriving consecutively pack into one record (the per-item record
        of idedup.c:455-516); interleaved pairs simply produce more
        records — the reader's row multiset is identical either way, so
        no pre-shuffle is required (repartition by pair upstream to get
        reference-shaped one-record-per-pair shards)."""
        os.makedirs(self.path, exist_ok=True)
        shard = f"part-{uuid.uuid4().hex}.sidp"
        tmp = os.path.join(self.path, f".{shard}.tmp.{os.getpid()}")
        n_records = 0
        cur_key = None
        cur: list[tuple] = []
        bounds = {c: [None, None] for c in _STAT_COLS}
        fh = None  # opened lazily so an empty task leaves no file behind

        def flush():
            nonlocal n_records, fh
            if cur:
                if fh is None:
                    fh = open(tmp, "wb")
                    fh.write(MAGIC + bytes([VERSION]))
                fh.write(_pack_record(cur_key[0], cur_key[1], cur))
                n_records += 1
                cur.clear()

        try:
            for row in iterator:
                key = (row.id_a, row.id_b)
                for c, v in zip(_STAT_COLS, key):
                    b = bounds[c]
                    b[0] = v if b[0] is None else min(b[0], v)
                    b[1] = v if b[1] is None else max(b[1], v)
                if key != cur_key:
                    flush()
                    cur_key = key
                cur.append(
                    (row.instr_id, row.kind, row.a_off, row.b_off, row.length,
                     row.payload)
                )
            flush()
        finally:
            if fh is not None:
                fh.close()
        if n_records == 0:
            return _SidpCommitMessage("", 0)
        os.replace(tmp, os.path.join(self.path, shard))
        return _SidpCommitMessage(shard, n_records, bounds)

    def commit(self, messages):
        """Driver-side manifest swap AFTER all shards exist (the
        write-after-data ordering of pipeline._LINEAGE and the streaming
        epoch manifests): append merges with the previous manifest,
        overwrite replaces it and unlinks the superseded shards — orphan
        shards from dead attempts are never listed, hence never read.

        The append read-modify-write holds an flock on a lock file, so
        concurrent single-host appenders serialize instead of silently
        dropping each other's shards; cross-host concurrent writers need
        a real catalog commit (the Iceberg mapping in pipeline.py) — a
        local manifest cannot provide that and does not claim to."""
        new = [
            {"name": m.shard, "n_records": m.n_records, "stats": m.stats}
            for m in messages
            if m and m.shard
        ]
        os.makedirs(self.path, exist_ok=True)
        import fcntl

        with open(os.path.join(self.path, ".sidp.lock"), "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            prev = (
                {"shards": [], "n_records": 0}
                if self.overwrite
                else _read_manifest(self.path)
            )
            superseded = (
                [s["name"] for s in _read_manifest(self.path)["shards"]]
                if self.overwrite
                else []
            )
            manifest = {
                "shards": prev["shards"] + new,
                "n_records": prev["n_records"] + sum(s["n_records"] for s in new),
                "version": VERSION,
            }
            tmp = os.path.join(self.path, f".{MANIFEST}.tmp.{os.getpid()}")
            with open(tmp, "w") as fh:
                json.dump(manifest, fh)
            os.replace(tmp, os.path.join(self.path, MANIFEST))
        # after the swap: drop shards the overwrite superseded (disk would
        # otherwise leak a full table copy per overwrite). Same read-race
        # caveat as every file-listing format without snapshot isolation
        # (parquet overwrite included): a reader that planned from the old
        # manifest and has not opened the files yet will miss them —
        # snapshot isolation is the catalog's job (Iceberg mapping).
        keep = {s["name"] for s in manifest["shards"]}
        for name in superseded:
            if name not in keep:
                try:
                    os.remove(os.path.join(self.path, name))
                except OSError:
                    pass

    def abort(self, messages):
        for m in messages:
            if m and m.shard:
                try:
                    os.remove(os.path.join(self.path, m.shard))
                except OSError:
                    pass


def compact(spark, path: str, n_shards: int) -> None:
    """Rewrite a store's accumulated small shards into ``n_shards``
    range-partitioned ones (append-heavy stores accrue one shard per
    writing task — the small-file problem every table format compacts
    away; cf. streaming.compact_cluster_store).

    Crash-safe: the compacted output is written to a SIDE store
    (``.compact_tmp/``, its own manifest — the main store is untouched),
    its shards are then moved into the main directory as *unlisted*
    orphans, and the main-manifest swap (``os.replace``) is the single
    commit point; only after it are the old shards unlinked. A crash at
    any step leaves the committed view intact: a stale side store (a
    retry clears it) and/or unlisted orphan files (never read; swept by
    the next successful compact). Readers racing the post-commit unlink
    can lose old files they planned on — the same caveat as any
    file-listing format without snapshot isolation; a catalog commit
    (Iceberg mapping) is the cross-job answer. Range partitioning by
    ``id_a`` makes the compacted shards' min/max stats disjoint, so the
    pruning path gets sharper as a side effect."""
    import shutil

    man = _read_manifest(path)
    old = [s["name"] for s in man["shards"]]
    side = os.path.join(path, ".compact_tmp")
    shutil.rmtree(side, ignore_errors=True)  # dead previous attempt
    df = spark.read.format("sidp").load(path)
    (
        df.repartitionByRange(n_shards, "id_a", "id_b", "instr_id")
        .write.format("sidp")
        .mode("overwrite")
        .save(side)
    )
    new = _read_manifest(side)["shards"]
    # sweep orphans from older crashed attempts, then land the new shards
    # as orphans themselves (unlisted until the swap below)
    listed = set(old) | {s["name"] for s in new}
    for f in os.listdir(path):
        if f.endswith(".sidp") and f not in listed:
            try:
                os.remove(os.path.join(path, f))
            except OSError:
                pass
    for s in new:
        os.replace(os.path.join(side, s["name"]), os.path.join(path, s["name"]))
    manifest = {
        "shards": new,
        "n_records": sum(s["n_records"] for s in new),
        "version": VERSION,
    }
    tmp = os.path.join(path, f".{MANIFEST}.tmp.compact.{os.getpid()}")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(path, MANIFEST))  # commit point
    shutil.rmtree(side, ignore_errors=True)
    for name in old:
        try:
            os.remove(os.path.join(path, name))
        except OSError:
            pass


class SpanContainerDataSource(DataSource):
    """``spark.read.format("sidp")`` / ``df.write.format("sidp")``."""

    @classmethod
    def name(cls) -> str:
        return "sidp"

    def schema(self) -> str:
        return SIDP_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _SidpReader(self.options)

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return _SidpWriter(self.options, overwrite)
