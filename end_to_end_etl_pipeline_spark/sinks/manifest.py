"""Manifest-based table commits: object-store-portable, crash-safe,
with bucket-pruned SCD2 rewrites.

Round-1 review flagged the two scale-killers in this engine's storage
layer: ``os.rename``-based swaps (local-FS only, torn window between
the two renames) and full-table rewrites per SCD2 apply. This module
replaces both with the standard lakehouse-lite design (the same shape
Delta/Iceberg use, reduced to its core):

* **Immutable data dirs.** Every commit writes parquet into a fresh
  ``data/<uuid>/`` directory — nothing is ever renamed or overwritten
  in place (rename-free = safe on S3-style stores where dir renames
  are O(n) copies and non-atomic).
* **Versioned manifests.** A manifest JSON lists exactly which data
  dirs (per key-bucket) constitute a table version. Readers resolve
  ``max(version)`` and read only the listed dirs; a crash mid-commit
  leaves orphan data dirs and tmp files but never a visible
  half-state. Publication is a single ``FileSystem.rename`` of the
  manifest tmp file — atomic on HDFS/local; on S3 bind this one call
  to a conditional PUT. Rename-onto-existing fails → the writer
  re-reads the log and retries at N+1 (optimistic concurrency).
* **Hadoop FileSystem API only** (via ``spark._jvm``): the same code
  drives ``file:``, ``hdfs:``, ``s3a:``, ``abfss:`` URIs. No
  ``os.path`` / ``os.walk`` on the data path.
* **Bucketed dimensions.** A dimension committed with ``n_buckets``
  is hash-partitioned on its business key (``pmod(hash(keys), N)``).
  An SCD2 apply computes which buckets the source touches (a distinct
  over ≤ N small ints), reads and rewrites *only those buckets*, and
  re-points untouched buckets at their existing dirs in the new
  manifest. A daily trickle touching 1% of keys rewrites ≈ the
  touched buckets, not 100 TB.

Capability parity: reference commits via Delta managed tables
(``medallion/bronze/ds2b_company_house.py:91-97``) and two-transaction
SCD2 MERGE (``medallion/silver/b2s_yfinance.py:150-186``); this gives
the same observable semantics with single-manifest atomicity.
"""

from __future__ import annotations

import json
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from end_to_end_etl_pipeline_spark.operators.scd import (
    prepare_scd_source,
    scd2_next_state,
)

BUCKET_COL = "__bucket"
_MANIFEST_FMT = "manifest-{:08d}.json"


class HadoopFS:
    """Thin wrapper over org.apache.hadoop.fs.FileSystem via py4j."""

    def __init__(self, spark: SparkSession, base_uri: str):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()
        self._Path = self._jvm.org.apache.hadoop.fs.Path
        self.fs = self._Path(base_uri).getFileSystem(self._conf)
        # Resolved ONCE from the root's actual filesystem: the python
        # fast path must agree with the JVM ops about which backend a
        # path names. Deciding per-path from the URI scheme alone
        # split-brained scheme-less roots on clusters where
        # fs.defaultFS is not file: (manifests written to local disk,
        # exists/listdir answered by HDFS).
        try:
            self._fs_is_local = str(self.fs.getScheme()) == "file"
        except Exception:
            self._fs_is_local = False

    def path(self, p: str):
        return self._Path(p)

    def exists(self, p: str) -> bool:
        return self.fs.exists(self.path(p))

    def mkdirs(self, p: str) -> None:
        self.fs.mkdirs(self.path(p))

    def listdir(self, p: str) -> list[str]:
        if not self.exists(p):
            return []
        return [str(st.getPath()) for st in self.fs.listStatus(self.path(p))]

    def _local(self, p: str):
        """Local filesystem path when the catalog's resolved
        filesystem is local, else None. Large manifests marshalled
        byte-by-byte through py4j cost seconds at 10-100k dirs
        (measured: most of an 8.3 s latest_manifest at 100k dirs was
        the 35 MB py4j transfer); direct Python IO is what any real
        deployment's native client (s3/hdfs bindings) would do.
        Gated on the ROOT's filesystem, not the path's URI scheme —
        a scheme-less path must take the same backend as the JVM
        ops, which resolve it against the root fs. An explicitly
        remote-schemed URI (hdfs://, s3a://, ...) is never local,
        even under a local root: answering its path component here
        would read/write a same-named local file — the inverse
        split-brain of the py4j fast path this method exists for."""
        if not self._fs_is_local:
            return None
        import urllib.parse

        u = urllib.parse.urlparse(p)
        if u.scheme not in ("", "file"):
            return None
        return urllib.parse.unquote(u.path) or p

    def write_text(self, p: str, text: str, overwrite: bool = False) -> None:
        local = self._local(p)
        if local is not None:
            import os

            os.makedirs(os.path.dirname(local), exist_ok=True)
            # "x" preserves the create-fails-if-exists contract
            with open(local, "w" if overwrite else "x", encoding="utf-8") as f:
                f.write(text)
            return
        out = self.fs.create(self.path(p), overwrite)  # default: fail if exists
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def read_text(self, p: str) -> str:
        local = self._local(p)
        if local is not None:
            with open(local, encoding="utf-8") as f:
                return f.read()
        stream = self.fs.open(self.path(p))
        try:
            # IOUtils drains the stream fully regardless of block size
            b = self._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
            return bytes(b).decode("utf-8")
        finally:
            stream.close()

    def rename(self, src: str, dst: str) -> bool:
        return bool(self.fs.rename(self.path(src), self.path(dst)))

    def rename_exclusive(self, src: str, dst: str) -> bool:
        """Atomically claim ``dst`` with ``src``'s content; False if
        ``dst`` already exists. This is THE commit primitive — a
        check-then-rename is NOT enough on a local filesystem, where
        POSIX rename() silently OVERWRITES an existing destination:
        two writers racing the same version slot would both 'win' and
        one commit's dirs would be lost (caught by the two-writer
        fuzz). Local path: link(2) — atomic exclusive by contract.
        JVM path: HDFS rename returns false onto an existing
        destination (the Delta/Iceberg commit assumption); object
        stores without atomic claim semantics need a coordination
        service, same as Delta on S3."""
        sl, dl = self._local(src), self._local(dst)
        if sl is not None and dl is not None:
            import os

            try:
                os.link(sl, dl)
            except FileExistsError:
                return False
            os.unlink(sl)
            return True
        return not self.exists(dst) and bool(
            self.fs.rename(self.path(src), self.path(dst))
        )

    def delete(self, p: str) -> None:
        self.fs.delete(self.path(p), True)

    def qualified(self, p: str) -> str:
        """Fully-qualified URI (scheme + authority) — the ONLY safe
        form for path equality: '/x' and 'file:/x' name the same dir
        but never compare equal as strings."""
        return str(self.fs.makeQualified(self.path(p)))

    def mtime_ms(self, p: str) -> int:
        return int(self.fs.getFileStatus(self.path(p)).getModificationTime())


class ManifestCatalog:
    """``zone.table`` → ``<root>/zone/table`` with versioned-manifest
    commits. Drop-in for ``ParquetCatalog`` (exists/read/replace_atomic/
    append/drop) plus bucket-aware reads for pruned SCD2."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")
        self.fs = HadoopFS(spark, self.root)
        # per-dir bloom sidecar cache: a dir's blooms sidecar is written
        # once, before the dir is ever referenced, and never mutated —
        # so cache entries can't go stale (vacuum deletes whole dirs,
        # and a deleted dir is never probed again)
        self._bloom_sidecars: dict[str, dict] = {}
        # (table, col) -> DataType: committed column types are
        # immutable (see _column_type), so this never invalidates
        self._col_types: dict[tuple[str, str], object] = {}
        # (table, version) -> parsed manifest. A committed version is
        # immutable, so entries never go stale (drop() invalidates —
        # a recreated table restarts at version 1). CONTRACT: the
        # returned dict is shared — treat it as read-only; commit
        # paths copy the maps they modify (they all do).
        self._manifest_cache: dict[tuple[str, int], dict] = {}
        # segment path -> loaded Segment (immutable files; see
        # sinks/segments.py)
        self._segment_cache: dict[str, object] = {}

    # -- layout ---------------------------------------------------------
    def table_dir(self, name: str) -> str:
        return "/".join([self.root, *name.split(".")])

    def _manifest_dir(self, name: str) -> str:
        return f"{self.table_dir(name)}/_manifests"

    def _new_data_dir(self, name: str) -> str:
        return f"{self.table_dir(name)}/data/{uuid.uuid4().hex}"

    # -- manifest log ---------------------------------------------------
    def _versions(self, name: str) -> list[int]:
        out = []
        for p in self.fs.listdir(self._manifest_dir(name)):
            base = p.rsplit("/", 1)[-1]
            if base.startswith("manifest-") and base.endswith(".json"):
                out.append(int(base[len("manifest-") : -len(".json")]))
        return sorted(out)

    def _latest_version(self, name: str) -> int | None:
        """Newest committed version, in O(1 + writer-lag) instead of
        an O(versions) directory listing: every publish drops a
        ``_latest`` hint (last-writer-wins, advisory); the reader
        verifies the hinted version exists and scans FORWARD over the
        dense version sequence until the first gap — a stale hint
        (lost overwrite race) costs a few existence probes, a
        missing/corrupt hint falls back to the full listing. This is
        the version-count axis of manifest-log growth (the Delta
        ``_last_checkpoint`` move): without it every read of — and
        every commit attempt against — a 10k-commit table pays a
        10k-entry listing."""
        mdir = self._manifest_dir(name)
        v = None
        try:
            v = int(self.fs.read_text(f"{mdir}/_latest").strip())
            if not self.fs.exists(f"{mdir}/{_MANIFEST_FMT.format(v)}"):
                v = None  # hint ahead of a crash-rolled-back publish
        except Exception:
            v = None
        if v is None:
            versions = self._versions(name)
            if not versions:
                return None
            v = versions[-1]
        while self.fs.exists(f"{mdir}/{_MANIFEST_FMT.format(v + 1)}"):
            v += 1
        return v

    def latest_manifest(self, name: str) -> dict | None:
        v = self._latest_version(name)
        return None if v is None else self.manifest_at(name, v)

    def manifest_at(self, name: str, version: int) -> dict:
        key = (name, version)
        m = self._manifest_cache.get(key)
        if m is None:
            path = f"{self._manifest_dir(name)}/{_MANIFEST_FMT.format(version)}"
            m = json.loads(self.fs.read_text(path))
            if len(self._manifest_cache) >= 8:  # bound driver RAM
                self._manifest_cache.pop(next(iter(self._manifest_cache)))
            self._manifest_cache[key] = m
        return m

    def _commit(self, name: str, manifest: dict) -> int:
        """Last-writer-wins publish: write tmp, rename to the next
        version slot; on collision retry at a later slot. ONLY safe
        for full-replacement content (replace_atomic) whose manifest
        does not depend on the previous version. Content derived FROM
        a previous manifest (append, bucketed SCD, optimize /
        optimize_zorder — compaction rows ARE the prior version) must
        go through :meth:`_commit_if` + rebase, or a concurrent
        commit's dirs would be silently dropped."""
        mdir = self._manifest_dir(name)
        self.fs.mkdirs(mdir)
        while True:
            last = self._latest_version(name)
            version = (last + 1) if last else 1
            if self._try_publish(name, manifest, version):
                return version

    def _commit_if(self, name: str, manifest: dict, expected_base: int) -> int | None:
        """Compare-and-swap publish: claim exactly version
        ``expected_base + 1``. Returns the version on success, None if
        another writer got there first — the caller re-reads the new
        latest, rebases its content, and retries."""
        self.fs.mkdirs(self._manifest_dir(name))
        version = expected_base + 1
        return version if self._try_publish(name, manifest, version) else None

    def _try_publish(self, name: str, manifest: dict, version: int) -> bool:
        manifest["version"] = version
        mdir = self._manifest_dir(name)
        tmp = f"{mdir}/.tmp-{uuid.uuid4().hex}"
        self.fs.write_text(tmp, json.dumps(manifest, indent=2, sort_keys=True))
        target = f"{mdir}/{_MANIFEST_FMT.format(version)}"
        if self.fs.rename_exclusive(tmp, target):
            # best-effort last-writer hint for O(1) latest_manifest;
            # advisory only (stale → forward scan, torn/corrupt →
            # listing fallback), so publish never fails on it
            try:
                self.fs.write_text(f"{mdir}/_latest", str(version),
                                   overwrite=True)
            except Exception:
                pass
            return True
        self.fs.delete(tmp)
        return False

    # -- catalog surface ------------------------------------------------
    def exists(self, name: str) -> bool:
        """K10 — a table exists iff it has a committed manifest."""
        return self.latest_manifest(name) is not None

    def _dirs(self, manifest: dict, buckets: Sequence[int] | None = None) -> list[str]:
        if manifest.get("bucket_dirs") is not None:
            sel = (
                manifest["bucket_dirs"].items()
                if buckets is None
                else [(str(b), manifest["bucket_dirs"].get(str(b), [])) for b in buckets]
            )
            return sorted({d for _b, ds in sel for d in ds})
        return list(manifest["dirs"])

    def read(
        self,
        name: str,
        buckets: Sequence[int] | None = None,
        version: int | None = None,
    ) -> DataFrame:
        """Resolve a manifest (latest, or ``version`` for time travel
        — immutable data dirs make every retained version readable
        until vacuumed) and scan exactly its dirs. ``buckets`` prunes
        a bucketed table to the named buckets' subdirectories —
        partition pruning by manifest, no listing of unrelated
        data."""
        manifest = (
            self.manifest_at(name, version)
            if version is not None
            else self.latest_manifest(name)
        )
        if manifest is None:
            raise FileNotFoundError(f"table {name} has no committed manifest")
        dirs = self._dirs(manifest, buckets)
        if not dirs:
            # a legitimately empty selection (a bucket whose rows were
            # all filtered away — or a bucketed table whose buckets are
            # ALL empty) is zero rows, not a missing table. Schema
            # comes from the newest retained version that still has
            # data dirs; recursing with buckets=None would re-land
            # here and raise on an all-empty table.
            for v in reversed(self._versions(name)):
                m = self.manifest_at(name, v)
                ds = self._dirs(m)
                if ds:
                    return self.spark.read.parquet(*ds).filter(F.lit(False))
            raise FileNotFoundError(f"table {name}: no data dirs")
        reader = self.spark.read
        if len(dirs) > 1:
            # append-path schema evolution (K9): dirs committed before a
            # column existed read as NULL — the reference needs ALTER
            # TABLE ADD COLUMN for this (b2s_yfinance.py:46-61); merged
            # footers make it automatic. Single-dir reads skip the
            # footer-merge job.
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*dirs)

    def _read_dirs(self, dirs: Sequence[str]) -> DataFrame:
        """Scan an explicit dir list with the catalog's footer-merge
        convention (mergeSchema only when >1 dir — single-dir reads
        skip the footer-merge job)."""
        reader = self.spark.read
        if len(dirs) > 1:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*dirs)

    def _dir_stats(self, data_dir: str, stats_cols: Sequence[str]) -> dict:
        """Per-data-dir min/max column stats for manifest-level data
        skipping (the file-stats half of Iceberg/Delta pruning,
        hoisted to dir granularity to match this catalog's commit
        unit). One narrow scan of just-written files; JSON-native
        column types only (numbers, strings) — cast dates upstream."""
        aggs = []
        for c in stats_cols:
            aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
        row = self.spark.read.parquet(data_dir).agg(*aggs).first()
        return {c: [row[f"__min_{c}"], row[f"__max_{c}"]] for c in stats_cols}

    #: per-dir bloom parameters — fixed so every dir's bitmap and the
    #: probe compute identical positions (same md5 derivation as
    #: operators/sketches, replayed driver-side for probing)
    BLOOM_BITS = 4096  # floor (and the legacy fixed size)
    BLOOM_MAX_BITS = 1 << 21  # 2M bits = 256 KiB/dir/col ceiling
    BLOOM_HASHES = 3
    # dirs per manifest segment checkpoint (sinks/segments.py). Once
    # a table accumulates this many unsealed metadata-bearing dirs,
    # append seals them into one immutable columnar file: planning
    # cost drops from O(dirs) file opens + dict walks to O(dirs/1024)
    # reads + numpy gathers (measured 240→100k-dir curve in SCALE.md)
    SEGMENT_SIZE = 1024
    #: bitmaps whose total words (across the dir's bloom columns)
    #: reach this move to a per-dir SIDECAR file; smaller ones stay
    #: inline in the manifest JSON. The r07 metadata study: inline
    #: bitmaps make every commit re-serialize every dir's words —
    #: manifest size grows O(dirs), commit cost O(dirs), cumulative
    #: log O(dirs²) — the exact curve Delta's checkpoint/sidecar
    #: split exists to cut. 512 words = 32 KiB bitmap ≈ 3k keys.
    BLOOM_SIDECAR_MIN_WORDS = 512

    def _dir_blooms(self, data_dir: str, bloom_cols: Sequence[str]) -> dict:
        """Per-data-dir Bloom bitmaps for point-lookup data skipping —
        the membership half of Iceberg/Delta file pruning. min/max
        stats can't prune equality probes on hash-like high-
        cardinality keys (every dir's range spans everything); a bloom
        per dir answers 'could this key be here?' with no false
        negatives. One narrow scan of the just-written dir via the
        shared ``operators/sketches`` builder.

        SIZED TO THE DIR (r06): a fixed bitmap saturates as appends
        grow — at 10x data a 4096-bit bloom over ~190k keys/dir
        approves every probe and targeted deletes degrade to
        rewrite-everything (correct but change-DISproportional). Each
        dir's bitmap is ~10 bits/key (FP ≈ 1.7% at k=3), power-of-two
        clamped to [BLOOM_BITS, BLOOM_MAX_BITS]; the size travels
        with the bitmap ({col: {"num_bits": m, "words": {word:
        bits}}}) because probe positions are modulo m — a probe
        against the wrong modulus would be a silent false negative.
        Legacy bitmaps ({col: {word: bits}}) read as BLOOM_BITS.

        Sizing key count = the dir's ROW count (r07): count(*) on
        just-written parquet answers from footer metadata — no data
        scan — and is shared across every bloom column, vs the r06
        per-column distinct().count() which re-scanned the dir once
        per column before the bloom-build scan. Rows upper-bound
        distinct keys, so duplicate-heavy dirs only OVER-size
        (lower FP, never a correctness or saturation risk).

        SIDECAR SPLIT (r07): big bitmaps don't live in the manifest.
        Every commit rewrites the whole manifest JSON, so inline
        words make commit cost and driver parse time grow with TOTAL
        dir count — the one driver-side surface that was O(table) at
        100 TB. Bitmaps past ``BLOOM_SIDECAR_MIN_WORDS`` are written
        ONCE to ``<data_dir>/_sidecar/blooms.json`` (inside the dir: written
        before the manifest references it — crash leaves unreferenced
        garbage, never a dangling pointer — immutable afterwards, and
        vacuum reclaims it with the dir); the manifest keeps only
        {num_bits, sidecar: 1} per column. Probes lazy-load and cache
        sidecars per dir, so a point lookup reads only the candidate
        dirs' sidecars, never the whole table's."""
        from end_to_end_etl_pipeline_spark.operators.sketches import bloom_build

        df = self.spark.read.parquet(data_dir)
        out: dict = {}
        n = df.count() if bloom_cols else 0  # footer-only job
        num_bits = self.BLOOM_BITS
        while num_bits < 10 * n and num_bits < self.BLOOM_MAX_BITS:
            num_bits *= 2
        for c in bloom_cols:
            keys = df.select(c).where(F.col(c).isNotNull())
            rows = bloom_build(
                keys,
                c,
                num_bits=num_bits,
                num_hashes=self.BLOOM_HASHES,
            ).collect()
            out[c] = {
                "num_bits": num_bits,
                "words": {str(r["word"]): int(r["bits"]) for r in rows},
            }
        total_words = sum(len(v["words"]) for v in out.values())
        if out and total_words >= self.BLOOM_SIDECAR_MIN_WORDS:
            self.fs.write_text(
                f"{data_dir}/_sidecar/blooms.json", json.dumps(out, sort_keys=True)
            )
            return {
                c: {"num_bits": v["num_bits"], "sidecar": 1}
                for c, v in out.items()
            }
        return out

    @staticmethod
    def _bloom_parse(bm) -> tuple[int, dict] | None:
        """(num_bits, words) from either INLINE bitmap format: sized
        (r06, {"num_bits": m, "words": {...}}) or legacy fixed-size
        ({word: bits} under BLOOM_BITS). Sidecar markers resolve via
        :meth:`_bloom_resolve` (needs the dir path)."""
        if bm is None:
            return None
        if "words" in bm and isinstance(bm.get("words"), dict):
            return int(bm["num_bits"]), bm["words"]
        return ManifestCatalog.BLOOM_BITS, bm

    def _bloom_resolve(self, data_dir: str, col: str, bm) -> tuple[int, dict] | None:
        """(num_bits, words) for one dir/column, resolving a sidecar
        marker through the per-dir cache. An unreadable or incomplete
        sidecar returns None — the caller keeps the dir (pruning is
        an IO optimization; a guess would risk a false negative)."""
        if bm is None:
            return None
        if isinstance(bm, dict) and bm.get("sidecar"):
            side = self._bloom_sidecars.get(data_dir)
            if side is None:
                self._load_sidecars([data_dir])
                side = self._bloom_sidecars[data_dir]
            entry = side.get(col)
            if not entry or not isinstance(entry.get("words"), dict):
                return None
            return int(bm["num_bits"]), entry["words"]
        return self._bloom_parse(bm)

    # -- manifest segments (sinks/segments.py) ---------------------------
    def _segment(self, manifest: dict, seg_id: str):
        """Loaded (cached) Segment for one sealed-map id. Segment
        files are immutable, so cache entries never go stale."""
        path = (manifest.get("segments") or {})[seg_id]
        seg = self._segment_cache.get(path)
        if seg is None:
            from end_to_end_etl_pipeline_spark.sinks.segments import load_segment

            seg = load_segment(self, path)
            self._cache_segment(path, seg)
        return seg

    #: max cached segments (~8 MB numpy each at 1024 dirs x 32k-bit
    #: blooms): 512 ≈ 4 GB ceiling — covers a 500k-dir working set
    #: before FIFO eviction, vs unbounded growth across many tables
    SEGMENT_CACHE_MAX = 512

    def _cache_segment(self, path: str, seg) -> None:
        if len(self._segment_cache) >= self.SEGMENT_CACHE_MAX:
            self._segment_cache.pop(next(iter(self._segment_cache)))
        self._segment_cache[path] = seg

    def _prefetch_segments(self, manifest: dict, seg_ids) -> None:
        """Bulk-load missing segments concurrently (pyarrow releases
        the GIL on file IO; an object store serves parallel GETs) —
        a 100k-dir table has ~100 segments and loading them serially
        would put a multi-second cold stall on the first plan."""
        paths = {
            (manifest.get("segments") or {}).get(s)
            for s in seg_ids
        } - {None}
        missing = [p for p in paths if p not in self._segment_cache]
        if len(missing) <= 1:
            return  # single load: no pool overhead
        from concurrent.futures import ThreadPoolExecutor

        from end_to_end_etl_pipeline_spark.sinks.segments import load_segment

        def one(p):
            try:
                return p, load_segment(self, p)
            except Exception:
                return p, None  # resolver keeps the dirs conservatively

        with ThreadPoolExecutor(max_workers=8) as ex:
            for p, seg in ex.map(one, missing):
                if seg is not None:
                    self._cache_segment(p, seg)

    def _stats_for(self, manifest: dict, d: str) -> dict:
        """Per-dir {col: [lo, hi]} stats, tail-or-segment resolved."""
        s = (manifest.get("stats") or {}).get(d)
        if s is not None:
            return s
        seg_id = (manifest.get("sealed") or {}).get(d)
        if seg_id is None:
            return {}
        try:
            return self._segment(manifest, seg_id).stats_of(d)
        except Exception:
            return {}  # unreadable segment: planning keeps the dir

    def _bloom_cols_for(self, manifest: dict, d: str) -> list[str]:
        """Column names with a bloom for one dir, tail-or-segment."""
        bm = (manifest.get("blooms") or {}).get(d)
        if bm is not None:
            return sorted(bm)
        seg_id = (manifest.get("sealed") or {}).get(d)
        if seg_id is None:
            return []
        try:
            return sorted(self._segment(manifest, seg_id).bloom_cols_of(d))
        except Exception:
            return []

    def _maybe_seal(
        self, name: str, dirs, stats: dict, blooms: dict,
        sealed: dict, segments: dict,
    ) -> None:
        """Seal the oldest SEGMENT_SIZE unsealed metadata-bearing dirs
        into one segment file, moving their stats/bloom entries out of
        the manifest JSON (mutates the four maps in place; called
        inside append's CAS loop — a lost race re-derives, and the
        orphaned segment file is vacuum-collected). The segment is
        written BEFORE the manifest references it."""
        from end_to_end_etl_pipeline_spark.sinks.segments import write_segment

        while True:
            candidates = [
                d for d in dirs
                if (d in stats or d in blooms) and d not in sealed
            ]
            if len(candidates) < self.SEGMENT_SIZE:
                return
            pick = candidates[: self.SEGMENT_SIZE]
            # bulk-load the picks' sidecars first: _bloom_resolve
            # would otherwise read them one file at a time (1024
            # serial round trips on an object store)
            self._load_sidecars(
                [
                    d for d in pick
                    if any(
                        isinstance(bm, dict) and bm.get("sidecar")
                        for bm in (blooms.get(d) or {}).values()
                    )
                ]
            )
            rows = []
            for d in pick:
                rb = {}
                for col, bm in (blooms.get(d) or {}).items():
                    parsed = self._bloom_resolve(d, col, bm)
                    if parsed is not None:  # unreadable sidecar →
                        rb[col] = parsed    # seal stats-only (conservative)
                rows.append((d, stats.get(d) or {}, rb))
            seg_id, path = write_segment(self, name, rows)
            segments[seg_id] = path
            for d in pick:
                stats.pop(d, None)
                blooms.pop(d, None)
                sealed[d] = seg_id

    @staticmethod
    def _prune_segments(sealed: dict, segments: dict) -> None:
        """Drop segment registry entries no sealed dir references
        (after rewrites removed their last dirs) — in place."""
        live = set(sealed.values())
        for sid in [s for s in segments if s not in live]:
            del segments[sid]

    def _load_sidecars(self, dirs: Sequence[str]) -> None:
        """Bulk-load bloom sidecars into the per-dir cache. A probe
        over a big table may need hundreds of sidecars cold; one
        py4j/object-store round trip EACH would put an O(dirs) stall
        back on the driver — exactly what the sidecar split removed
        from commits. ``file:`` dirs read directly (local IO,
        ~0.1 ms); anything else fetches every missing file in ONE
        ``spark.read.text(wholetext)`` job (an object store serves
        the GETs in parallel). Unreadable sidecars cache as {} — the
        probe keeps those dirs."""
        missing = [d for d in dict.fromkeys(dirs) if d not in self._bloom_sidecars]
        if not missing:
            return
        remote = []
        for d in missing:
            if d.startswith("file:"):
                import pathlib
                import urllib.parse

                p = pathlib.Path(
                    urllib.parse.urlparse(d).path
                ) / "_sidecar" / "blooms.json"
                try:
                    self._bloom_sidecars[d] = json.loads(p.read_text())
                except Exception:
                    self._bloom_sidecars[d] = {}
            else:
                remote.append(d)
        if not remote:
            return
        try:
            import urllib.parse

            rows = (
                self.spark.read.text(
                    [f"{d}/_sidecar/blooms.json" for d in remote], wholetext=True
                )
                .select(
                    F.input_file_name().alias("path"), F.col("value")
                )
                .collect()
            )
            # key on the decoded PATH component: input_file_name
            # renders file:///x (URL-encoded) where makeQualified
            # says file:/x — comparing full URIs silently matches
            # nothing and disables pruning
            def _pathkey(p: str) -> str:
                return urllib.parse.unquote(urllib.parse.urlparse(p).path)

            by_path = {_pathkey(r["path"]): r["value"] for r in rows}
            for d in remote:
                text = by_path.get(
                    _pathkey(self.fs.qualified(f"{d}/_sidecar/blooms.json"))
                )
                try:
                    self._bloom_sidecars[d] = json.loads(text) if text else {}
                except Exception:
                    self._bloom_sidecars[d] = {}
        except Exception:
            # batch read failed (e.g. one missing file): fall back to
            # per-dir reads so one bad sidecar can't disable pruning
            for d in remote:
                try:
                    self._bloom_sidecars[d] = json.loads(
                        self.fs.read_text(f"{d}/_sidecar/blooms.json")
                    )
                except Exception:
                    self._bloom_sidecars[d] = {}

    def _bloom_positions(
        self, value, spark_type=None, num_bits: int | None = None
    ) -> list[tuple[int, int]]:
        """Probe positions for one value: [(word, bit)] per hash row.
        Must match the JVM build bit-for-bit, or the probe silently
        skips the dir that holds the key (a false NEGATIVE — the one
        thing a bloom must never do).

        The build hashes ``CAST(col AS STRING)``; Python ``str()``
        renders bool ('True' vs 'true'), float (repr/scientific
        notation), Decimal (trailing-zero scale), and timestamps
        differently, so the driver-side hashlib fast path runs only
        when the CALLER passes ``spark_type=None`` — the caller's
        contract (see :meth:`bloom_pruned_dirs`) is that it does so
        only for (str value, string column) and (int value, integral
        column), the pairings whose renderings provably agree. Every
        other case routes through the SAME Spark expression as the
        build
        (``operators/sketches._bloom_pos`` over a one-row literal
        frame): a ~100 ms local job, paid only for exotic probe
        types, never a wrong bit. ``spark_type`` pins the literal
        frame's column to the TABLE column's type — type inference
        would otherwise render e.g. a python Decimal as
        decimal(38,18) ('3.14000000000000000000') where the build
        hashed decimal(10,4) ('3.1400')."""
        import hashlib

        m = num_bits or self.BLOOM_BITS
        if spark_type is None:
            out = []
            for h in range(self.BLOOM_HASHES):
                pos = (
                    int(
                        hashlib.md5(f"{h}:{value}".encode()).hexdigest()[:8],
                        16,
                    )
                    % m
                )
                out.append((pos // 32, pos % 32))
            return out
        from pyspark.sql.types import StructField, StructType

        from end_to_end_etl_pipeline_spark.operators.sketches import (
            _bloom_pos,
        )

        probe_df = self.spark.createDataFrame(
            [(value,)],
            StructType([StructField("__key", spark_type)]),
        )
        rows = (
            probe_df
            .select(
                F.explode(
                    F.sequence(F.lit(0), F.lit(self.BLOOM_HASHES - 1))
                ).alias("__h"),
                "__key",
            )
            .select(
                _bloom_pos(F.col("__h"), F.col("__key"), m).alias("__pos")
            )
            .collect()
        )
        return [(r["__pos"] // 32, r["__pos"] % 32) for r in rows]

    def bloom_pruned_dirs(
        self, name: str, col: str, value, version: int | None = None
    ) -> list[str]:
        """Data dirs whose bloom for ``col`` MIGHT contain ``value``.
        Dirs without a bloom are kept — skipping is an IO optimization
        and must never change results. NULL probes keep every dir
        (equality on NULL matches nothing anyway)."""
        manifest = (
            self.manifest_at(name, version)
            if version is not None
            else self.latest_manifest(name)
        )
        if manifest is None:
            raise FileNotFoundError(f"table {name} has no committed manifest")
        col_type = self._column_type(name, col, manifest)
        return self._bloom_pruned_dirs_resolved(manifest, col, value, col_type)

    def _column_type(self, name: str, col: str, manifest: dict):
        """Datatype of one column, without the full-table mergeSchema
        footer job ``read(name).schema`` pays (O(dirs) — measured
        ~2 s at 240 dirs, ON EVERY point probe): read the NEWEST
        dir's footer only (new columns land in new dirs, so it has
        the evolved schema), fall back to the merged view if the
        column is absent there. Cached per (table, col) — a committed
        column's TYPE can never change (parquet schema-merge would
        reject the dir), so the cache can't go stale."""
        key = (name, col)
        t = self._col_types.get(key)
        if t is not None:
            return t
        dirs = self._dirs(manifest)
        if dirs:
            sch = self.spark.read.parquet(dirs[-1]).schema
            if col in sch.names:
                t = sch[col].dataType
        if t is None:
            t = self.read(name).schema[col].dataType
        self._col_types[key] = t
        return t

    def _bloom_pruned_dirs_resolved(
        self, manifest: dict, col: str, value, col_type
    ) -> list[str]:
        """:meth:`bloom_pruned_dirs` after manifest/column-type
        resolution — batch callers (``delete_where`` probing many
        values) resolve ONCE and loop here instead of paying a
        manifest read + schema resolution per value."""
        blooms = manifest.get("blooms") or {}
        if value is None:
            return self._dirs(manifest)
        # The fast-path decision must consult the TABLE column's type,
        # not the probe value's Python type: an int probe against a
        # double column renders '42' in Python but the build hashed
        # CAST(42.0 AS STRING) = '42.0' — every bit wrong, a silent
        # false negative. Only (str value, string column) and
        # (non-bool int value, integral column) provably render
        # identically; everything else goes through the build's own
        # Spark expression typed as the column. (Schema fetch is
        # metadata-only, no job.)
        from pyspark.sql.types import (
            ByteType, IntegerType, LongType, ShortType, StringType,
        )

        fast = (
            isinstance(value, str) and isinstance(col_type, StringType)
        ) or (
            isinstance(value, int)
            and not isinstance(value, bool)
            and isinstance(
                col_type, (ByteType, ShortType, IntegerType, LongType)
            )
        )
        # dirs may carry differently-sized bitmaps (adaptive sizing,
        # legacy 4096): probe positions are modulo the bitmap size, so
        # compute (and cache) one probe per distinct size
        probes: dict[int, list[tuple[int, int]] | None] = {}

        def probe_for(m: int):
            if m not in probes:
                try:
                    probes[m] = self._bloom_positions(
                        value, None if fast else col_type, num_bits=m
                    )
                except Exception:
                    # a probe value the column's type can't hold (e.g.
                    # a str probe against bigint): pruning is an IO
                    # optimization — degrade to keeping the dir rather
                    # than guessing a rendering and risking a false
                    # negative
                    probes[m] = None
            return probes[m]

        all_dirs = self._dirs(manifest)
        sealed = manifest.get("sealed") or {}
        tail = [d for d in all_dirs if d not in sealed]
        self._load_sidecars(
            [
                d
                for d in tail
                if isinstance((blooms.get(d) or {}).get(col), dict)
                and (blooms.get(d) or {}).get(col, {}).get("sidecar")
            ]
        )
        # sealed dirs: one vectorized probe per segment, then restore
        # manifest dir order (segments are immutable and cached)
        kept_sealed: set[str] = set()
        seg_ids = dict.fromkeys(sealed[d] for d in all_dirs if d in sealed)
        self._prefetch_segments(manifest, seg_ids)
        for sid in seg_ids:
            try:
                seg = self._segment(manifest, sid)
                kept_sealed.update(seg.bloom_kept(col, probe_for))
            except Exception:
                # unreadable segment: pruning is an IO optimization —
                # keep every dir it covers rather than risk a false
                # negative
                kept_sealed.update(
                    d for d in all_dirs if sealed.get(d) == sid
                )
        kept = []
        for d in all_dirs:
            if d in sealed:
                if d in kept_sealed:
                    kept.append(d)
                continue
            parsed = self._bloom_resolve(d, col, (blooms.get(d) or {}).get(col))
            if parsed is None:
                kept.append(d)
                continue
            m, words = parsed
            probe = probe_for(m)
            if probe is None or all(
                (int(words.get(str(w), 0)) >> b) & 1 for w, b in probe
            ):
                kept.append(d)
        return kept

    def read_point(self, name: str, col: str, value) -> DataFrame:
        """Equality-probe read with bloom-level data skipping: scan
        only dirs whose bloom might contain the key, then apply the
        row filter (blooms prove possible membership, not membership).
        The point-lookup complement of :meth:`read_range` — at scale,
        the difference between reading the one append that holds an
        id and listing a year of appends whose min/max all straddle
        it."""
        dirs = self.bloom_pruned_dirs(name, col, value)
        if not dirs:
            return self.read(name).filter(F.lit(False))
        reader = self.spark.read
        if len(dirs) > 1:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*dirs).filter(F.col(col) == F.lit(value))

    def pruned_dirs(
        self, name: str, col: str, lo, hi, version: int | None = None
    ) -> list[str]:
        """Data dirs whose [min,max] stats for ``col`` overlap
        [lo, hi]. Dirs without stats (or with an all-NULL column) are
        kept — skipping is an IO optimization and must never change
        results; the caller still applies the row filter."""
        manifest = (
            self.manifest_at(name, version)
            if version is not None
            else self.latest_manifest(name)
        )
        if manifest is None:
            raise FileNotFoundError(f"table {name} has no committed manifest")
        stats = manifest.get("stats") or {}
        sealed = manifest.get("sealed") or {}
        all_dirs = self._dirs(manifest)
        # sealed dirs: vectorized range check per segment
        kept_sealed: set[str] = set()
        seg_ids = dict.fromkeys(sealed[d] for d in all_dirs if d in sealed)
        self._prefetch_segments(manifest, seg_ids)
        for sid in seg_ids:
            try:
                seg = self._segment(manifest, sid)
                kept_sealed.update(seg.range_kept(col, lo, hi))
            except Exception:
                kept_sealed.update(d for d in all_dirs if sealed.get(d) == sid)
        kept = []
        for d in all_dirs:
            if d in sealed:
                if d in kept_sealed:
                    kept.append(d)
                continue
            rng = (stats.get(d) or {}).get(col)
            if rng is None or rng[0] is None or rng[1] is None:
                kept.append(d)
            elif not (rng[1] < lo or rng[0] > hi):
                kept.append(d)
        return kept

    def read_range(self, name: str, col: str, lo, hi) -> DataFrame:
        """Range-predicate read with manifest-level data skipping:
        scan only dirs whose stats overlap, then apply the row filter
        (dir stats bound ranges, they don't prove membership). At
        scale this is the difference between touching one day's
        append and listing a year of them."""
        dirs = self.pruned_dirs(name, col, lo, hi)
        if not dirs:  # every dir skipped: empty frame, full schema
            return self.read(name).filter(F.lit(False))
        reader = self.spark.read
        if len(dirs) > 1:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*dirs).filter(F.col(col).between(lo, hi))

    def diff_versions(
        self,
        name: str,
        v_from: int,
        v_to: int | None = None,
        keys: Sequence[str] | None = None,
    ) -> DataFrame:
        """Change-data-feed between two committed versions (the
        observable surface of Delta's ``readChangeFeed``), derived
        from the immutable version log rather than per-commit change
        files.

        Without ``keys``: full-row multiset symmetric difference —
        ``_change_type`` ∈ {insert, delete} via two ``exceptAll``
        hash set-ops (one shuffle each, map-side partial counting).

        With ``keys``: keyed CDC — a single full-outer join on the
        key columns comparing a sha2 hash of the non-key columns:
        new-only keys → insert, old-only → delete, both-but-changed →
        update_pre (old image) + update_post (new image). One shuffle
        on the keys; unchanged rows never leave the join stage.

        Columns added since ``v_from`` read as NULL in the old image
        (mergeSchema), so schema evolution surfaces as updates, not
        errors.
        """
        from end_to_end_etl_pipeline_spark.operators.hashing import row_hash_col

        if v_to is None:
            v_to = self._versions(name)[-1]
        old, new = self.read(name, version=v_from), self.read(name, version=v_to)
        all_cols = list(new.columns) + [c for c in old.columns if c not in new.columns]

        def aligned(df: DataFrame, other: DataFrame) -> DataFrame:
            dtypes = dict(df.dtypes) | dict(other.dtypes)
            return df.select(
                *[
                    F.col(c) if c in df.columns else F.lit(None).cast(dtypes[c]).alias(c)
                    for c in all_cols
                ]
            )

        old, new = aligned(old, new), aligned(new, old)
        ct = "_change_type"
        if not keys:
            return new.exceptAll(old).withColumn(ct, F.lit("insert")).unionByName(
                old.exceptAll(new).withColumn(ct, F.lit("delete"))
            )
        data_cols = [c for c in all_cols if c not in keys]
        h = row_hash_col(data_cols)
        o = old.withColumn("__h", h).alias("o")
        n = new.withColumn("__h", h).alias("n")
        cond = [o[k].eqNullSafe(n[k]) for k in keys]
        j = o.join(n, cond, "full_outer")
        # presence via the hash cols: never NULL on a real row (the
        # null-sentinel concat hash), unlike key cols which may be NULL
        o_first, n_first = F.col("o.__h"), F.col("n.__h")
        side = lambda a, cols: [F.col(f"{a}.{c}").alias(c) for c in cols]  # noqa: E731
        inserts = j.filter(o_first.isNull() & n_first.isNotNull()).select(
            *side("n", all_cols), F.lit("insert").alias(ct)
        )
        deletes = j.filter(n_first.isNull() & o_first.isNotNull()).select(
            *side("o", all_cols), F.lit("delete").alias(ct)
        )
        changed = j.filter(
            o_first.isNotNull()
            & n_first.isNotNull()
            & (F.col("o.__h") != F.col("n.__h"))
        )
        pre = changed.select(*side("o", all_cols), F.lit("update_pre").alias(ct))
        post = changed.select(*side("n", all_cols), F.lit("update_post").alias(ct))
        return inserts.unionByName(deletes).unionByName(pre).unionByName(post)

    def replace_atomic(
        self, df: DataFrame, name: str, partition_by=None, stats_cols=None,
        allow_unbucket: bool = False, bloom_cols=None,
    ) -> None:
        """K1 — full refresh as one manifest commit (readers see old or
        new, never between; crash leaves old manifest current).
        Refuses to overwrite a bucketed table (that would silently
        discard its bucket layout and metadata — IVF stores, SCD2
        bucket maps) unless ``allow_unbucket=True``."""
        prior = self.latest_manifest(name)
        if (
            prior is not None
            and prior.get("bucket_dirs") is not None
            and not allow_unbucket
        ):
            raise ValueError(
                f"table {name} is bucketed (bucket_fn="
                f"{prior.get('bucket_fn', 'hash_pmod')!r}); overwriting would "
                "discard its layout — pass allow_unbucket=True if intended"
            )
        data_dir = self._new_data_dir(name)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data_dir)
        manifest = {"dirs": [data_dir], "bucket_dirs": None, "n_buckets": None}
        if stats_cols:
            manifest["stats"] = {data_dir: self._dir_stats(data_dir, stats_cols)}
        if bloom_cols:
            manifest["blooms"] = {data_dir: self._dir_blooms(data_dir, bloom_cols)}
        self._commit(name, manifest)
        # A wholesale rewrite can legally land a different type for an
        # existing column name (no schema-merge guard spans versions) —
        # a stale cached type would hash bloom probes wrongly and
        # silently prune a dir that holds the value. Drop this table's
        # cached column types; sidecars key on (now-orphaned) dirs, so
        # fresh dirs re-read naturally.
        for key in [k for k in self._col_types if k[0] == name]:
            del self._col_types[key]

    # reference-surface aliases (K1/K2)
    overwrite = replace_atomic

    def append(self, df: DataFrame, name: str, stats_cols=None, bloom_cols=None) -> None:
        """K2 — append = new data dir + manifest listing old dirs + new.
        Bucketed tables reject plain appends (they would break the
        bucket→dir mapping): route changes through ``BucketedSCD2``.
        Existing dirs' stats and blooms carry forward untouched —
        immutable dirs mean they never go stale."""
        data_dir = self._new_data_dir(name)
        df.write.mode("overwrite").parquet(data_dir)
        new_stats = self._dir_stats(data_dir, stats_cols) if stats_cols else None
        new_blooms = self._dir_blooms(data_dir, bloom_cols) if bloom_cols else None
        # CAS loop: the manifest content derives from the latest
        # version, so rebase + retry on a concurrent commit instead of
        # silently dropping its dirs (lost update)
        while True:
            manifest = self.latest_manifest(name)
            if manifest is not None and manifest.get("bucket_dirs") is not None:
                raise ValueError(
                    f"table {name} is bucketed; append via BucketedSCD2.apply, "
                    "not ManifestCatalog.append"
                )
            dirs = (manifest["dirs"] if manifest else []) + [data_dir]
            stats = dict((manifest or {}).get("stats") or {})
            if new_stats is not None:
                stats[data_dir] = new_stats
            blooms = dict((manifest or {}).get("blooms") or {})
            if new_blooms is not None:
                blooms[data_dir] = new_blooms
            sealed = dict((manifest or {}).get("sealed") or {})
            segments = dict((manifest or {}).get("segments") or {})
            self._maybe_seal(name, dirs, stats, blooms, sealed, segments)
            base = manifest["version"] if manifest else 0
            if self._commit_if(
                name,
                {
                    "dirs": dirs,
                    "bucket_dirs": None,
                    "n_buckets": None,
                    "stats": stats or None,
                    "blooms": blooms or None,
                    "sealed": sealed or None,
                    "segments": segments or None,
                },
                base,
            ):
                return

    def append_bucketed(
        self,
        df: DataFrame,
        name: str,
        bucket_expr,
        n_buckets: int,
        bucket_keys: Sequence[str],
        bucket_fn: str = "hash_pmod",
        extras_update: dict | None = None,
        extras_fn=None,
    ) -> None:
        """K2 for BUCKETED tables: write the batch partitioned by its
        bucket id and CAS-merge the new per-bucket subdirs into
        ``bucket_dirs`` — buckets untouched by the batch keep their
        existing dir lists verbatim, so bucket-pruned readers never
        pay for appends elsewhere. First call creates the table with
        the given layout; later calls must match it (changing the
        bucket contract silently would corrupt pruning).

        ``bucket_expr`` is a Column producing the bucket id (callers
        own the contract — e.g. ``pmod(hash(cols), n)`` or an identity
        cell id, mirroring ``bucket_fn``).

        ``extras_update`` merges extra keys into the committed
        manifest ATOMICALLY with the dir merge — the hook streaming
        bridges use to ride a replay marker (e.g. last applied batch
        id) on the same commit as the data, so a crash between data
        and marker cannot happen.

        ``extras_fn`` is the read-modify-write form of the same hook:
        ``extras_fn(manifest_or_None) -> dict``, called INSIDE the
        CAS loop with the manifest the commit will be attempted
        against, so keys whose new value depends on the previous one
        (e.g. merging per-cell row counts) stay correct under
        concurrent appends — a dict computed outside would go stale
        on CAS retry.  Applied after ``extras_update``."""
        data_dir = self._new_data_dir(name)
        (
            df.withColumn(BUCKET_COL, bucket_expr.cast("int"))
            .write.mode("overwrite")
            .partitionBy(BUCKET_COL)
            .parquet(data_dir)
        )
        new_subdirs: dict[str, str] = {}
        for p in self.fs.listdir(data_dir):
            base = p.rsplit("/", 1)[-1]
            if base.startswith(f"{BUCKET_COL}="):
                new_subdirs[base.split("=", 1)[1]] = p
        while True:
            manifest = self.latest_manifest(name)
            if manifest is None:
                bucket_dirs = {b: [d] for b, d in new_subdirs.items()}
                committed = self._commit_if(
                    name,
                    {
                        "dirs": None,
                        "bucket_dirs": bucket_dirs,
                        "n_buckets": n_buckets,
                        "bucket_keys": list(bucket_keys),
                        "bucket_fn": bucket_fn,
                    }
                    | (extras_update or {})
                    | (extras_fn(None) if extras_fn else {}),
                    0,
                )
                if committed:
                    return
                continue
            if manifest.get("bucket_dirs") is None:
                raise ValueError(
                    f"table {name} is unbucketed; use append, not append_bucketed"
                )
            if (
                manifest.get("n_buckets") != n_buckets
                or list(manifest.get("bucket_keys") or []) != list(bucket_keys)
                or manifest.get("bucket_fn", "hash_pmod") != bucket_fn
            ):
                raise ValueError(
                    f"table {name}: bucket layout mismatch "
                    f"(existing n={manifest.get('n_buckets')} "
                    f"keys={manifest.get('bucket_keys')} "
                    f"fn={manifest.get('bucket_fn', 'hash_pmod')!r})"
                )
            bucket_dirs = {b: list(ds) for b, ds in manifest["bucket_dirs"].items()}
            for b, d in new_subdirs.items():
                bucket_dirs.setdefault(b, []).append(d)
            extras = {
                k: v
                for k, v in manifest.items()
                if k not in ("version", "dirs", "bucket_dirs", "stats", "blooms")
            }
            if self._commit_if(
                name,
                extras
                | {"dirs": None, "bucket_dirs": bucket_dirs}
                | (extras_update or {})
                | (extras_fn(manifest) if extras_fn else {}),
                manifest["version"],
            ):
                return

    def drop(self, name: str) -> None:
        self.fs.delete(self.table_dir(name))
        # A later table of the same name may carry different column
        # types; stale entries would mis-hash its bloom probes. Its
        # version numbers also restart at 1, so cached manifests for
        # the old incarnation would shadow the new one's.
        for key in [k for k in self._col_types if k[0] == name]:
            del self._col_types[key]
        for key in [k for k in self._manifest_cache if k[0] == name]:
            del self._manifest_cache[key]

    def delete_where(self, name: str, col: str, values: Sequence) -> int:
        """Targeted row delete (the GDPR / right-to-be-forgotten path,
        Delta's ``DELETE WHERE key IN (...)``): rewrite ONLY the data
        dirs that might contain the keys — bloom-pruned per value,
        with stats/bloom-less dirs conservatively included — leave
        every other dir untouched byte-for-byte, and commit the swap
        atomically.  At scale this is the difference between
        rewriting the one append that holds a user's rows and
        rewriting a year of table.

        Versioning: the PRIOR manifest still references the
        pre-delete dirs, so time-travel reads keep working until
        :meth:`vacuum` reclaims them — the vacuum retention window is
        the audit-trail-vs-erasure-deadline dial, exactly as in
        Delta/Iceberg.  Stats and blooms for untouched dirs carry
        forward verbatim; the rewritten dir gets fresh ones over the
        same column sets (a deleted key's bits may linger in other
        dirs' blooms — blooms overapprove, never skip wrongly).

        Plain (dir-listed) tables only; CAS-retried against
        concurrent appends (each retry re-prunes against the new
        manifest; an abandoned rewrite dir is a crash orphan that
        :meth:`vacuum` collects).  Returns rows deleted."""
        # NULL values cannot match by equality, but a NULL inside an
        # IN-list poisons the KEEP filter: for every non-matching row
        # ``x IN (ids..., NULL)`` is NULL, ``~NULL`` is NULL, and the
        # rewrite would silently drop (nearly) the whole table — so
        # strip them up front
        values = [v for v in values if v is not None]
        if not values:
            return 0
        while True:
            manifest = self.latest_manifest(name)
            if manifest is None:
                raise FileNotFoundError(f"table {name} has no committed manifest")
            if manifest.get("bucket_dirs") is not None:
                raise ValueError(
                    f"table {name} is bucketed — delete via a bucket "
                    "rewrite is not implemented"
                )
            # resolve the column type ONCE for the whole key batch —
            # a per-value bloom_pruned_dirs call would re-read the
            # manifest and re-resolve the parquet schema per key
            col_type = self._column_type(name, col, manifest)
            affected_set: set[str] = set()
            for v in values:
                affected_set |= set(
                    self._bloom_pruned_dirs_resolved(manifest, col, v, col_type)
                )
            all_dirs = self._dirs(manifest)
            affected = [d for d in all_dirs if d in affected_set]
            if not affected:
                return 0
            keep = [d for d in all_dirs if d not in affected_set]
            df = self._read_dirs(affected)
            before = df.count()
            # NULL keys survive: DELETE WHERE col IN (...) is
            # three-valued — NULL IN (...) is NULL, not TRUE, so a
            # bare ~isin would silently drop NULL-keyed rows
            kept_rows = df.filter(
                F.col(col).isNull() | ~F.col(col).isin(values)
            )
            after = kept_rows.count()
            if after == before:
                return 0  # blooms overapproved; nothing actually matched
            new_dirs = list(keep)
            stats = dict(manifest.get("stats") or {})
            blooms = dict(manifest.get("blooms") or {})
            sealed = dict(manifest.get("sealed") or {})
            segments = dict(manifest.get("segments") or {})
            old_stat_cols = sorted(
                {c for d in affected for c in self._stats_for(manifest, d)}
            )
            old_bloom_cols = sorted(
                {c for d in affected for c in self._bloom_cols_for(manifest, d)}
            )
            for d in affected:
                stats.pop(d, None)
                blooms.pop(d, None)
                sealed.pop(d, None)
            self._prune_segments(sealed, segments)
            if after > 0:
                data_dir = self._new_data_dir(name)
                kept_rows.write.mode("overwrite").parquet(data_dir)
                new_dirs.append(data_dir)
                if old_stat_cols:
                    stats[data_dir] = self._dir_stats(data_dir, old_stat_cols)
                if old_bloom_cols:
                    blooms[data_dir] = self._dir_blooms(data_dir, old_bloom_cols)
            extras = {
                k: v
                for k, v in manifest.items()
                if k not in ("version", "dirs", "bucket_dirs", "stats",
                             "blooms", "sealed", "segments")
            }
            if self._commit_if(
                name,
                extras
                | {
                    "dirs": new_dirs,
                    "bucket_dirs": None,
                    "stats": stats or None,
                    "blooms": blooms or None,
                    "sealed": sealed or None,
                    "segments": segments or None,
                },
                manifest["version"],
            ):
                return before - after

    def shallow_clone(
        self, src: str, dst: str, version: int | None = None
    ) -> int:
        """Zero-copy snapshot publication (Delta's ``SHALLOW CLONE``):
        commit a new table whose manifest references the SOURCE's
        data dirs at ``version`` (default latest) — no bytes move, so
        cloning a 100-TB table is one JSON write.  The clone then
        evolves independently (appends/deletes land in its own dirs;
        the shared dirs are immutable by design).

        The standard shallow-clone caveat applies here exactly as in
        Delta: the clone's manifest references dirs under the
        SOURCE's table path, and :meth:`vacuum` is per-table — a
        vacuum of the source that drops the cloned version's dirs
        breaks the clone.  Pin the source's retention to cover live
        clones, or re-materialize (``replace_atomic(read(clone),
        ...)``) to sever the dependency — the deep-clone equivalent.
        Returns the committed clone version (always 1)."""
        manifest = (
            self.manifest_at(src, version)
            if version is not None
            else self.latest_manifest(src)
        )
        if manifest is None:
            raise FileNotFoundError(f"table {src} has no committed manifest")
        if self.latest_manifest(dst) is not None:
            raise ValueError(f"table {dst} already exists")
        clone = {k: v for k, v in manifest.items() if k != "version"}
        clone["cloned_from"] = {"table": src, "version": manifest["version"]}
        return self._commit(dst, clone)

    def update_where(
        self, name: str, col: str, values: Sequence, set_exprs: dict
    ) -> int:
        """Targeted row UPDATE (Delta's ``UPDATE ... WHERE key IN``,
        completing the catalog's CRUD surface next to append /
        delete_where / the SCD MERGEs): rewrite ONLY the dirs whose
        blooms might hold the keys, applying ``set_exprs``
        ({column: Column expression}) to the MATCHING rows — all
        other rows in those dirs, and every other dir byte-for-byte,
        pass through unchanged.  Set expressions may reference the
        row's own columns (``{"price": F.col("price") * 1.1}``).
        NULL keys never match (three-valued IN).  Stats/blooms for
        rewritten dirs are recomputed over the same column sets, so
        data skipping stays correct when an updated column IS a
        stats/bloom column.  Prior versions stay time-travelable
        until vacuum.  Returns rows updated."""
        values = [v for v in values if v is not None]
        if not values or not set_exprs:
            return 0
        bad = [c for c in set_exprs if c == col]
        if bad:
            raise ValueError(
                f"update_where cannot rewrite the match column {col!r} "
                "itself — delete + append expresses a key change "
                "without ambiguity"
            )
        while True:
            manifest = self.latest_manifest(name)
            if manifest is None:
                raise FileNotFoundError(f"table {name} has no committed manifest")
            if manifest.get("bucket_dirs") is not None:
                raise ValueError(
                    f"table {name} is bucketed — update via the bucketed "
                    "MERGE (BucketedSCD2) instead"
                )
            col_type = self._column_type(name, col, manifest)
            affected_set: set[str] = set()
            for v in values:
                affected_set |= set(
                    self._bloom_pruned_dirs_resolved(manifest, col, v, col_type)
                )
            all_dirs = self._dirs(manifest)
            affected = [d for d in all_dirs if d in affected_set]
            if not affected:
                return 0
            keep = [d for d in all_dirs if d not in affected_set]
            df = self._read_dirs(affected)
            match = F.col(col).isin(values)
            updated = df.filter(match).count()
            if updated == 0:
                return 0  # blooms overapproved; nothing matched
            out = df.withColumns(
                {
                    c: F.when(match, expr).otherwise(F.col(c))
                    for c, expr in set_exprs.items()
                }
            )
            stats = dict(manifest.get("stats") or {})
            blooms = dict(manifest.get("blooms") or {})
            sealed = dict(manifest.get("sealed") or {})
            segments = dict(manifest.get("segments") or {})
            old_stat_cols = sorted(
                {c for d in affected for c in self._stats_for(manifest, d)}
            )
            old_bloom_cols = sorted(
                {c for d in affected for c in self._bloom_cols_for(manifest, d)}
            )
            for d in affected:
                stats.pop(d, None)
                blooms.pop(d, None)
                sealed.pop(d, None)
            self._prune_segments(sealed, segments)
            data_dir = self._new_data_dir(name)
            out.write.mode("overwrite").parquet(data_dir)
            new_dirs = keep + [data_dir]
            if old_stat_cols:
                stats[data_dir] = self._dir_stats(data_dir, old_stat_cols)
            if old_bloom_cols:
                blooms[data_dir] = self._dir_blooms(data_dir, old_bloom_cols)
            extras = {
                k: v
                for k, v in manifest.items()
                if k not in ("version", "dirs", "bucket_dirs", "stats",
                             "blooms", "sealed", "segments")
            }
            if self._commit_if(
                name,
                extras
                | {
                    "dirs": new_dirs,
                    "bucket_dirs": None,
                    "stats": stats or None,
                    "blooms": blooms or None,
                    "sealed": sealed or None,
                    "segments": segments or None,
                },
                manifest["version"],
            ):
                return updated

    def delete_range(self, name: str, col: str, lo, hi) -> int:
        """Range-targeted delete — retention enforcement ("drop
        everything with ``col`` in [lo, hi]", typically an age
        cutoff): the range sibling of :meth:`delete_where`, pruned by
        the per-dir min/max STATS instead of blooms.  Dirs entirely
        inside the range are dropped WITHOUT being read or rewritten
        (the common case for time-ordered appends — expiring a month
        means unlinking that month's dirs from the manifest); dirs
        straddling a boundary are rewritten filtered; dirs outside,
        and stat-less dirs' complement, survive byte-for-byte.  NULLs
        survive (BETWEEN is three-valued).  Prior versions stay
        time-travelable until vacuum.  Returns rows deleted."""
        while True:
            manifest = self.latest_manifest(name)
            if manifest is None:
                raise FileNotFoundError(f"table {name} has no committed manifest")
            if manifest.get("bucket_dirs") is not None:
                raise ValueError(
                    f"table {name} is bucketed — range delete is for "
                    "plain (dir-listed) tables"
                )
            stats = dict(manifest.get("stats") or {})
            blooms = dict(manifest.get("blooms") or {})
            sealed = dict(manifest.get("sealed") or {})
            segments = dict(manifest.get("segments") or {})
            all_dirs = self._dirs(manifest)
            drop, rewrite, keep = [], [], []
            for d in all_dirs:
                # tail-or-segment: sealed dirs' stats live in their
                # segment file — without the lookup every sealed dir
                # would demote to the rewrite path
                rng = self._stats_for(manifest, d).get(col)
                if rng is None or rng[0] is None or rng[1] is None:
                    rewrite.append(d)  # unknown range: must look
                elif rng[1] < lo or rng[0] > hi:
                    keep.append(d)  # disjoint: untouched
                elif lo <= rng[0] and rng[1] <= hi:
                    drop.append(d)  # wholly inside: unlink, no read
                else:
                    rewrite.append(d)  # straddles a boundary
            if not drop and not rewrite:
                return 0
            deleted = 0
            new_dirs = list(keep)
            if drop:
                # min/max stats ignore NULLs, so a "wholly inside" dir
                # can still hold NULL rows that must SURVIVE (BETWEEN
                # is three-valued) — one column-pruned probe decides
                # between pure unlink and demotion to the rewrite path
                df_drop = self._read_dirs(drop)
                if df_drop.filter(F.col(col).isNull()).limit(1).count() > 0:
                    rewrite = rewrite + drop
                    drop = []
                else:
                    deleted += df_drop.count()
            if rewrite:
                df = self._read_dirs(rewrite)
                before = df.count()
                kept_rows = df.filter(
                    F.col(col).isNull() | ~F.col(col).between(lo, hi)
                )
                after = kept_rows.count()
                if after == before:
                    # stats overapproved (stat-less dirs, or a
                    # straddling range holding no rows): the rewrite
                    # dirs are byte-identical — keep them, write
                    # NOTHING (an unconditional rewrite would orphan a
                    # full copy of the table on every no-op call)
                    new_dirs.extend(rewrite)
                    rewrite = []
                else:
                    deleted += before - after
            old_stat_cols = sorted(
                {c for d in drop + rewrite for c in self._stats_for(manifest, d)}
            )
            old_bloom_cols = sorted(
                {c for d in drop + rewrite
                 for c in self._bloom_cols_for(manifest, d)}
            )
            for d in drop + rewrite:
                stats.pop(d, None)
                blooms.pop(d, None)
                sealed.pop(d, None)
            self._prune_segments(sealed, segments)
            if rewrite and after > 0:
                data_dir = self._new_data_dir(name)
                kept_rows.write.mode("overwrite").parquet(data_dir)
                new_dirs.append(data_dir)
                if old_stat_cols:
                    stats[data_dir] = self._dir_stats(data_dir, old_stat_cols)
                if old_bloom_cols:
                    blooms[data_dir] = self._dir_blooms(data_dir, old_bloom_cols)
            if deleted == 0:
                return 0  # nothing matched anywhere; state unchanged
            extras = {
                k: v
                for k, v in manifest.items()
                if k not in ("version", "dirs", "bucket_dirs", "stats",
                             "blooms", "sealed", "segments")
            }
            if self._commit_if(
                name,
                extras
                | {
                    "dirs": new_dirs,
                    "bucket_dirs": None,
                    "stats": stats or None,
                    "blooms": blooms or None,
                    "sealed": sealed or None,
                    "segments": segments or None,
                },
                manifest["version"],
            ):
                return deleted

    def delete_bucketed_where(
        self, name: str, col: str, values: Sequence, extras_fn=None
    ) -> int:
        """Targeted row delete on a BUCKETED table (the index-
        maintenance counterpart of :meth:`delete_where` — e.g.
        removing vectors from the IVF store or signatures from the
        dedup store): rewrite ONLY the buckets that actually hold
        matching rows, replacing each affected bucket's dir list with
        one compacted dir; every other bucket's dirs survive
        byte-for-byte.

        Discovery is one column-pruned scan (key columns only) that
        recomputes each row's bucket from the manifest's bucket
        contract (``identity`` / ``hash_pmod`` over ``bucket_keys``),
        so affected buckets and exact per-bucket delete counts come
        from a single job — deleting k rows then rewrites at most k
        buckets, change-proportional like every other maintenance op
        here.

        ``extras_fn(manifest, deleted_by_bucket) -> dict`` merges
        store-specific metadata into the SAME commit (the IVF store
        decrements its ``cell_counts`` this way) and is evaluated
        inside the CAS loop against the current manifest.  If a
        concurrent append lands in an AFFECTED bucket between read
        and commit, the whole delete restarts against the new state
        (replacing that bucket's dirs would silently drop the
        concurrent rows); appends to other buckets merge fine.
        Returns rows deleted."""
        # NULL values cannot match by equality, but a NULL inside an
        # IN-list poisons the KEEP filter: for every non-matching row
        # ``x IN (ids..., NULL)`` is NULL, ``~NULL`` is NULL, and the
        # rewrite would silently drop (nearly) the whole table — so
        # strip them up front
        values = [v for v in values if v is not None]
        if not values:
            return 0
        while True:
            manifest = self.latest_manifest(name)
            if manifest is None:
                raise FileNotFoundError(f"table {name} has no committed manifest")
            if manifest.get("bucket_dirs") is None:
                raise ValueError(
                    f"table {name} is unbucketed — use delete_where"
                )
            n = manifest["n_buckets"]
            keys = list(manifest.get("bucket_keys") or [])
            fn = manifest.get("bucket_fn", "hash_pmod")
            if fn == "identity":
                bucket_expr = F.col(keys[0]).cast("int")
            elif fn == "hash_pmod":
                bucket_expr = F.pmod(
                    F.hash(*[F.col(k) for k in keys]), F.lit(n)
                ).cast("int")
            else:
                raise ValueError(f"unknown bucket_fn {fn!r}")
            matches = self.read(name).filter(F.col(col).isin(values))
            per_bucket = {
                int(r["b"]): int(r["c"])
                for r in matches.groupBy(bucket_expr.alias("b"))
                .agg(F.count(F.lit(1)).alias("c"))
                .collect()
            }
            if not per_bucket:
                return 0
            affected = sorted(per_bucket)
            base_lists = {
                str(b): list(manifest["bucket_dirs"].get(str(b), []))
                for b in affected
            }
            kept = self.read(name, buckets=affected).filter(
                F.col(col).isNull() | ~F.col(col).isin(values)
            )
            data_dir = self._new_data_dir(name)
            (
                kept.withColumn(BUCKET_COL, bucket_expr)
                .write.mode("overwrite")
                .partitionBy(BUCKET_COL)
                .parquet(data_dir)
            )
            new_subdirs: dict[str, str] = {}
            for p in self.fs.listdir(data_dir):
                base = p.rsplit("/", 1)[-1]
                if base.startswith(f"{BUCKET_COL}="):
                    new_subdirs[base.split("=", 1)[1]] = p
            restart = False
            while True:
                cur = self.latest_manifest(name)
                stale = any(
                    list(cur["bucket_dirs"].get(b, [])) != ds
                    for b, ds in base_lists.items()
                )
                if stale:
                    restart = True  # an affected bucket moved under us
                    break
                bucket_dirs = {
                    b: list(ds) for b, ds in cur["bucket_dirs"].items()
                }
                for b in affected:
                    sub = new_subdirs.get(str(b))
                    bucket_dirs[str(b)] = [sub] if sub else []
                extras = {
                    k: v
                    for k, v in cur.items()
                    if k not in ("version", "dirs", "bucket_dirs", "stats", "blooms")
                }
                if self._commit_if(
                    name,
                    extras
                    | {"dirs": None, "bucket_dirs": bucket_dirs}
                    | (extras_fn(cur, per_bucket) if extras_fn else {}),
                    cur["version"],
                ):
                    return sum(per_bucket.values())
            if restart:
                continue

    # -- maintenance ----------------------------------------------------
    def optimize(
        self,
        name: str,
        cluster_by: Sequence[str] | None = None,
        target_partitions: int | None = None,
        stats_cols: Sequence[str] | None = None,
        bloom_cols: Sequence[str] | None = None,
    ) -> None:
        """K8 — compaction (+ optional clustering): rewrite the
        current table state into one fresh data dir, sorted within
        partitions on ``cluster_by`` so parquet row-group min/max
        stats give data skipping (the OPTIMIZE/ZORDER stand-in,
        reference ``medallion/gold/s2g.py:98-101``). Readers are
        never disturbed: old dirs stay referenced by old manifests
        until :meth:`vacuum`. Per-dir manifest stats are keyed by the
        (now replaced) old dirs, so pass ``stats_cols`` to recompute
        them for the compacted dir — otherwise manifest-level data
        skipping is off until the next stats-producing write.

        Compacted content is exactly the base version's rows, so the
        publish is a compare-and-swap on that base: a concurrent
        append landing mid-rewrite makes the CAS fail and the rewrite
        rebase onto the new latest (same lost-update discipline as
        :meth:`append` — last-writer-wins here would silently drop
        the concurrent commit's dirs). Orphaned rewrite dirs from
        lost races are collected by :meth:`vacuum`."""
        while True:
            manifest = self.latest_manifest(name)
            if manifest is None:
                raise FileNotFoundError(f"table {name} has no committed manifest")
            base = manifest["version"]
            bucketed = manifest.get("bucket_dirs") is not None
            if bucketed and (stats_cols or bloom_cols):
                # bucketed tables skip via bucket pruning, not manifest
                # stats/blooms (append_bucketed records neither) — a
                # silently ignored kwarg would read as "skipping is on"
                raise ValueError(
                    f"table {name} is bucketed: stats_cols/bloom_cols do "
                    "not apply (bucket pruning is its data-skipping "
                    "mechanism)"
                )
            # pin the scan to the base version: reading "latest" could
            # silently span a concurrent commit and desync from the CAS
            df = self.read(name, version=base)
            if cluster_by:
                n = target_partitions or self.spark.sparkContext.defaultParallelism
                df = df.repartition(n, *cluster_by).sortWithinPartitions(*cluster_by)
            elif target_partitions:
                df = df.coalesce(target_partitions)
            data_dir = self._new_data_dir(name)
            if bucketed:
                # bucket subdir reads drop the partition column; recompute
                # it from the manifest's recorded business keys
                keys = manifest["bucket_keys"]
                if manifest.get("bucket_fn", "hash_pmod") == "identity":
                    # identity-bucketed stores (IVF cell partitioning):
                    # the bucket id IS the key value, never hash(key)
                    df = df.withColumn(BUCKET_COL, F.col(keys[0]).cast("int"))
                else:
                    df = df.withColumn(
                        BUCKET_COL,
                        F.pmod(
                            F.hash(*[F.col(k) for k in keys]),
                            F.lit(manifest["n_buckets"]),
                        ),
                    )
                df.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(data_dir)
                bucket_dirs = {}
                for p in self.fs.listdir(data_dir):
                    base_name = p.rsplit("/", 1)[-1]
                    if base_name.startswith(f"{BUCKET_COL}="):
                        bucket_dirs[base_name.split("=", 1)[1]] = [p]
                # carry forward custom metadata (bucket_fn, ivf_* ...) —
                # dropping it would silently revert an identity-bucketed
                # store to the default hash contract
                extras = {
                    k: v
                    for k, v in manifest.items()
                    if k not in ("version", "dirs", "bucket_dirs", "stats", "blooms")
                }
                new = extras | {
                    "dirs": None, "bucket_dirs": bucket_dirs,
                    "n_buckets": manifest["n_buckets"],
                    "bucket_keys": list(keys),
                }
            else:
                df.write.mode("overwrite").parquet(data_dir)
                extras = {
                    k: v
                    for k, v in manifest.items()
                    # a full rewrite starts metadata fresh: carrying
                    # sealed/segments would pin dead segment files
                    if k not in ("version", "dirs", "bucket_dirs", "stats",
                                 "blooms", "sealed", "segments")
                }
                new = extras | {
                    "dirs": [data_dir], "bucket_dirs": None, "n_buckets": None,
                }
                if stats_cols:
                    new["stats"] = {data_dir: self._dir_stats(data_dir, stats_cols)}
                if bloom_cols:
                    new["blooms"] = {
                        data_dir: self._dir_blooms(data_dir, bloom_cols)
                    }
            if self._commit_if(name, new, base):
                return

    def maybe_vacuum(
        self,
        name: str,
        max_versions: int = 32,
        keep_versions: int = 4,
        min_age_seconds: int = 3600,
    ) -> list[str]:
        """Garbage-collection POLICY, completing the maintenance-
        policy family (:meth:`maybe_optimize`, the text index's
        ``maybe_purge_text_index``): run :meth:`vacuum` only once the
        manifest log exceeds ``max_versions`` — every commit
        (append, delete, optimize, streaming trigger) adds a version,
        so a long-running table's log and its superseded data dirs
        grow without bound unless something GCs, while an
        every-commit vacuum would pay listing cost and shrink the
        time-travel window needlessly.  Call at the same cadence as
        ``maybe_optimize`` (e.g. from a streaming bridge).  Returns
        the deleted dirs ([] = below threshold); ``keep_versions`` /
        ``min_age_seconds`` pass through with vacuum's usual
        reader/writer-safety semantics."""
        if len(self._versions(name)) <= max_versions:
            return []
        return self.vacuum(
            name, keep_versions=keep_versions, min_age_seconds=min_age_seconds
        )

    def maybe_optimize(
        self,
        name: str,
        max_dirs: int = 16,
        **optimize_kwargs,
    ) -> bool:
        """Compaction POLICY: run :meth:`optimize` only when the table
        has fragmented past ``max_dirs`` — the small-files trigger
        every append-heavy lakehouse table needs (Delta's
        auto-compact / scheduled OPTIMIZE). Each append commits one
        data dir, so a table taking frequent small batches degrades
        toward one-dir-per-batch scans; calling this after ingest
        (or from a foreachBatch) bounds read amplification at
        ``max_dirs`` scans' worth of listing forever, while quiet
        tables never pay a rewrite.

        Fragmentation measure: plain tables count manifest data dirs;
        bucketed tables count the WORST bucket's dir list (appends
        fragment per touched bucket, and a read probes one bucket —
        the per-probe cost is what the policy must bound).
        ``optimize_kwargs`` pass through (cluster_by /
        target_partitions; stats_cols / bloom_cols for PLAIN tables —
        optimize refuses them on bucketed tables, whose skipping is
        bucket pruning). Returns True iff a rewrite ran.
        Concurrency-safe: the underlying optimize CAS-rebases."""
        manifest = self.latest_manifest(name)
        if manifest is None:
            raise FileNotFoundError(f"table {name} has no committed manifest")
        bucket_dirs = manifest.get("bucket_dirs")
        if bucket_dirs:
            frag = max((len(ds) for ds in bucket_dirs.values()), default=0)
        else:
            frag = len(manifest.get("dirs") or [])
        if frag <= max_dirs:
            return False
        self.optimize(name, **optimize_kwargs)
        return True

    def optimize_zorder(
        self,
        name: str,
        cols: Sequence[str],
        bits: int = 8,
        n_dirs: int = 8,
        stats_cols: Sequence[str] | None = None,
    ) -> None:
        """K8, the interleaved-bit version: rewrite the table
        clustered on the Morton key of ``cols`` (see
        :mod:`sinks.zorder`), split into ``n_dirs`` key-range data
        dirs, each with min/max stats on ``stats_cols`` (default: the
        clustered columns). Unlike ``optimize(cluster_by=...)``'s
        linear sort — which skips on the leading column only — every
        clustered column gets manifest-level data skipping via
        :meth:`read_range` / :meth:`pruned_dirs`. Not for bucketed
        tables (their dir layout is the bucket map)."""
        from end_to_end_etl_pipeline_spark.sinks.zorder import zorder_key

        # CAS on the base version, like optimize(): the rewrite's
        # content IS the base version's rows, so a concurrent append
        # must force a rebase, not be silently dropped
        while True:
            manifest = self.latest_manifest(name)
            if manifest is None:
                raise FileNotFoundError(f"table {name} has no committed manifest")
            if manifest.get("bucket_dirs") is not None:
                raise ValueError(
                    f"table {name} is bucketed; zorder would break its layout"
                )
            base = manifest["version"]
            df = self.read(name, version=base)
            z = zorder_key(df, cols, bits=bits)
            key_space = 1 << (bits * len(cols))
            zb = F.least(
                F.lit(n_dirs - 1),
                F.floor(z / F.lit(key_space / n_dirs)).cast("int"),
            )
            data_dir = self._new_data_dir(name)
            (
                df.withColumn("__zb", zb)
                .repartition(n_dirs, "__zb")
                .sortWithinPartitions("__zb")
                .write.mode("overwrite")
                .partitionBy("__zb")
                .parquet(data_dir)
            )
            sub_dirs = sorted(
                p for p in self.fs.listdir(data_dir)
                if p.rsplit("/", 1)[-1].startswith("__zb=")
            )
            scols = list(stats_cols or cols)
            stats = {d: self._dir_stats(d, scols) for d in sub_dirs}
            new = {
                "dirs": sub_dirs, "bucket_dirs": None, "n_buckets": None,
                "stats": stats,
            }
            if self._commit_if(name, new, base):
                return

    def vacuum(
        self, name: str, keep_versions: int = 1, min_age_seconds: int = 3600
    ) -> list[str]:
        """Garbage-collect data dirs referenced by no retained
        manifest (superseded rewrites AND crash orphans that never
        got a manifest), plus manifests older than the retention
        window. Returns deleted data-dir paths.

        Committed retained versions can never be collected, so vacuum
        never races a reader. ``min_age_seconds`` protects in-flight
        *writers*: a concurrent commit's data dir exists before its
        manifest does and would otherwise look like an orphan — only
        dirs older than the age floor are eligible (the same reason
        Delta/Iceberg vacuums have a retention threshold). Paths are
        compared fully-qualified: '/x' vs 'file:/x' string inequality
        must not defeat the referenced-set check."""
        import time as _time

        versions = self._versions(name)
        if not versions:
            return []
        retained = versions[-keep_versions:]
        referenced: set[str] = set()
        referenced_segs: set[str] = set()
        for v in retained:
            m = json.loads(
                self.fs.read_text(f"{self._manifest_dir(name)}/{_MANIFEST_FMT.format(v)}")
            )
            dirs = (
                [d for ds in m["bucket_dirs"].values() for d in ds]
                if m.get("bucket_dirs") is not None
                else m["dirs"]
            )
            # normalize bucket subdirs back to their data/<uuid> root
            for d in dirs:
                parts = d.rstrip("/").split("/")
                while len(parts) > 1 and parts[-2] != "data":
                    parts.pop()
                referenced.add(self.fs.qualified("/".join(parts)))
            for p in (m.get("segments") or {}).values():
                referenced_segs.add(self.fs.qualified(p))
        now_ms = int(_time.time() * 1000)
        deleted = []
        for p in self.fs.listdir(f"{self.table_dir(name)}/data"):
            if self.fs.qualified(p) in referenced:
                continue
            if now_ms - self.fs.mtime_ms(p) < min_age_seconds * 1000:
                continue  # possibly an in-flight writer's dir
            self.fs.delete(p)
            deleted.append(p)
        # segment checkpoints referenced by no retained manifest
        # (rewrites dropped their last sealed dir, or a lost CAS race
        # orphaned the file) — same age floor protects in-flight seals
        for p in self.fs.listdir(f"{self.table_dir(name)}/_segments"):
            if self.fs.qualified(p) in referenced_segs:
                continue
            if now_ms - self.fs.mtime_ms(p) < min_age_seconds * 1000:
                continue
            self.fs.delete(p)
            deleted.append(p)
        for v in versions:
            if v not in retained:
                self.fs.delete(f"{self._manifest_dir(name)}/{_MANIFEST_FMT.format(v)}")
                # a cached manifest for a vacuumed version would let
                # manifest_at() succeed while the data dirs are gone
                self._manifest_cache.pop((name, v), None)
        return deleted


class BucketedSCD2:
    """SCD Type-2 maintenance over a bucketed dimension in a
    :class:`ManifestCatalog` — apply cost ∝ buckets containing
    changed keys, with single-manifest atomicity."""

    def __init__(self, catalog: ManifestCatalog, n_buckets: int = 64):
        self.catalog = catalog
        self.n_buckets = n_buckets

    def _bucketed(self, df: DataFrame, keys: Sequence[str]) -> DataFrame:
        return df.withColumn(
            BUCKET_COL, F.pmod(F.hash(*[F.col(k) for k in keys]), F.lit(self.n_buckets))
        )

    def apply(
        self,
        source: DataFrame,
        table: str,
        keys: Sequence[str],
        tracked: Sequence[str],
        as_of=None,
        dedup_order_by=None,
        check_unique: bool = True,
    ) -> dict:
        """Returns {"changed_buckets": [...], "version": N} for
        observability (BENCH asserts apply cost tracks bucket count)."""
        cat, fs = self.catalog, self.catalog.fs
        source = prepare_scd_source(source, keys, dedup_order_by, check_unique)
        src = self._bucketed(source, keys)

        manifest = cat.latest_manifest(table)
        if manifest is None:
            data_dir = cat._new_data_dir(table)
            state = self._bucketed(
                scd2_next_state(None, source, keys, tracked, as_of), keys
            )
            state.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(data_dir)
            bucket_dirs = {
                str(b): [f"{data_dir}/{BUCKET_COL}={b}"]
                for b in self._buckets_in_dir(data_dir)
            }
            version = cat._commit(
                table,
                {"dirs": None, "bucket_dirs": bucket_dirs, "n_buckets": self.n_buckets,
                 "bucket_keys": list(keys)},
            )
            return {"changed_buckets": sorted(int(b) for b in bucket_dirs), "version": version}

        if manifest.get("bucket_fn", "hash_pmod") != "hash_pmod":
            raise ValueError(
                f"table {table} uses bucket_fn={manifest['bucket_fn']!r} "
                "(identity-partitioned store); BucketedSCD2's hash bucketing "
                "would scramble its layout"
            )
        if manifest.get("n_buckets") != self.n_buckets:
            raise ValueError(
                f"table {table} committed with n_buckets={manifest.get('n_buckets')}, "
                f"applier configured with {self.n_buckets}"
            )
        # buckets touched by this batch: distinct over small ints (≤ N)
        changed = sorted(
            r[0] for r in src.select(BUCKET_COL).distinct().collect()
        )
        if not changed:
            return {"changed_buckets": [], "version": manifest["version"]}

        have_dirs = cat._dirs(manifest, changed)
        current_state = (
            cat.read(table, buckets=changed) if have_dirs else None
        )  # all-new buckets → first-load semantics for this slice
        next_state = scd2_next_state(current_state, source, keys, tracked, as_of)
        data_dir = cat._new_data_dir(table)
        self._bucketed(next_state, keys).write.mode("overwrite").partitionBy(
            BUCKET_COL
        ).parquet(data_dir)

        written = self._buckets_in_dir(data_dir)
        ours = {
            str(b): ([f"{data_dir}/{BUCKET_COL}={b}"] if b in written else [])
            for b in changed
        }  # bucket emptied (all rows filtered) → no dirs
        # CAS + rebase: a concurrent apply touching OTHER buckets is
        # merged (its bucket dirs survive); one touching the SAME
        # bucket invalidated the state this rewrite was computed from
        # — fail loudly rather than silently dropping either write.
        snapshot = manifest
        while True:
            latest = cat.latest_manifest(table)
            for b in changed:
                if latest["bucket_dirs"].get(str(b)) != snapshot["bucket_dirs"].get(
                    str(b)
                ):
                    raise RuntimeError(
                        f"concurrent SCD2 apply modified bucket {b} of {table} "
                        f"(snapshot v{snapshot['version']}, latest "
                        f"v{latest['version']}); re-run this apply"
                    )
            bucket_dirs = dict(latest["bucket_dirs"]) | ours
            version = cat._commit_if(
                table,
                {"dirs": None, "bucket_dirs": bucket_dirs,
                 "n_buckets": self.n_buckets, "bucket_keys": list(keys)},
                latest["version"],
            )
            if version:
                return {"changed_buckets": changed, "version": version}

    def _buckets_in_dir(self, data_dir: str) -> set[int]:
        out = set()
        for p in self.catalog.fs.listdir(data_dir):
            base = p.rsplit("/", 1)[-1]
            if base.startswith(f"{BUCKET_COL}="):
                out.add(int(base.split("=", 1)[1]))
        return out

    def read_current(self, table: str) -> DataFrame:
        return self.catalog.read(table).filter(F.col("is_current")).drop(BUCKET_COL)

    def read_all(self, table: str) -> DataFrame:
        return self.catalog.read(table).drop(BUCKET_COL)
