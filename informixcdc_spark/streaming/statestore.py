"""Commit protocols for the materializer's state pointer and snapshots.

The materializer's per-batch commit is a pointer swap: write the new
state document, then make it THE state atomically. The reference keeps
this state inside the Informix server (``sql/informixcdc.sql:7-38``,
``ext/_informixcdcmodule.ec:2269-2299``) where transactional atomicity
is free; a Spark deployment has to get the same guarantee from its
storage layer, and the right primitive differs by backend:

- :class:`PosixStateStore` — single-writer local/NFS path. The pointer
  is ONE mutable ``state.json`` republished with ``os.replace`` (an
  atomic rename). Matches the engine's pre-round-5 behavior exactly.
- :class:`ManifestStateStore` — object-store-safe. Object stores
  (S3/GCS/ABFS) have atomic PUT-if-complete but NO atomic rename, so
  the pointer is a monotonically versioned IMMUTABLE manifest
  ``manifest/state-{version:020d}.json``: commit = PUT a brand-new
  object (never overwrite, never rename), read = LIST the manifest
  prefix and take the newest manifest that parses. A write torn by a
  crash (possible in the local-FS emulation; a real object store
  either completes a PUT or leaves nothing) is skipped by the reader,
  which falls back to the previous version — the same state a
  crashed-before-PUT writer leaves behind, handled by the
  materializer's batchId-idempotent replay. Old manifests are pruned
  behind a keep-window at commit time.

Both stores also expose the tiny filesystem surface the materializer's
snapshot GC and bucket discovery need (list / exists / delete-tree /
absolute paths for Spark parquet IO), so swapping the store swaps the
whole persistence protocol. Small side documents (the schema-epoch
registry, ``streaming/pipeline.py``) ride the same versioned-publish
path via :meth:`StateStore.write_doc`.

Single-writer contract per state dir (one streaming query), identical
to the checkpointLocation contract Structured Streaming itself imposes.
"""

from __future__ import annotations

import json
import os
import shutil


class StateStore:
    """Abstract pointer-commit + snapshot-filesystem protocol.

    ``root`` is the state directory. Relative paths handed to the fs
    helpers are slash-separated and resolved under ``root``.
    """

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- pointer protocol ---------------------------------------------------
    def read_state(self) -> dict | None:
        """The last committed state document, or None if never committed."""
        raise NotImplementedError

    def commit_state(self, state: dict) -> None:
        """Atomically publish ``state`` as the current pointer."""
        raise NotImplementedError

    # -- side documents (schema registry, ...) ------------------------------
    def read_doc(self, name: str) -> dict | None:
        raise NotImplementedError

    def write_doc(self, name: str, doc: dict) -> None:
        raise NotImplementedError

    # -- snapshot filesystem surface ----------------------------------------
    def path(self, *parts: str) -> str:
        """Absolute path under the store root (for Spark parquet IO)."""
        return os.path.join(self.root, *parts)

    def listdir(self, *parts: str) -> list[str]:
        p = self.path(*parts)
        return os.listdir(p) if os.path.isdir(p) else []

    def exists(self, *parts: str) -> bool:
        return os.path.exists(self.path(*parts))

    def delete_tree(self, *parts: str) -> None:
        shutil.rmtree(self.path(*parts), ignore_errors=True)


class PosixStateStore(StateStore):
    """Mutable-pointer store for rename-capable filesystems (local, NFS
    with close-to-open coherence): ``state.json`` republished via the
    atomic ``os.replace``."""

    def _doc_path(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.json")

    def read_state(self) -> dict | None:
        return self.read_doc("state")

    def commit_state(self, state: dict) -> None:
        self.write_doc("state", state)

    def read_doc(self, name: str) -> dict | None:
        try:
            with open(self._doc_path(name)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def write_doc(self, name: str, doc: dict) -> None:
        tmp = self._doc_path(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f)
        os.replace(tmp, self._doc_path(name))  # atomic pointer swap


class ManifestStateStore(StateStore):
    """Rename-free store for object-store semantics: every commit PUTs a
    NEW immutable object; the current pointer is the newest parseable
    manifest in a LIST of the manifest prefix. No object is ever renamed
    or rewritten in place — the only mutations are create-new and
    delete-old (GC), both of which object stores do atomically.

    The manifest PROTOCOL lives here; the four storage primitives it
    needs (`_read_bytes` / `_create_new` / `_remove` plus the base
    class's LIST) are small overridable methods, so a different storage
    client (e.g. :class:`HadoopFsStateStore`) reuses the committed
    protocol verbatim by re-binding the primitives.
    """

    #: manifests retained behind the newest (readers that LISTed just
    #: before a commit can still open what they saw). Doc channels
    #: (write_doc) share the same window — fine because docs are
    #: metadata-sized by contract (an epoch registry rewrites its full
    #: epoch list per DDL change, i.e. a few hundred bytes per rewrite)
    KEEP_MANIFESTS = 4

    # -- storage primitives (override for a remote client) ------------------
    def _read_bytes(self, path: str) -> bytes:
        """GET: raises FileNotFoundError when the object is absent."""
        with open(path, "rb") as f:
            return f.read()

    def _create_new(self, path: str, data: bytes) -> None:
        """PUT-new (the conditional-create analog): a versioned manifest
        is never overwritten; a duplicate version means the
        single-writer contract was broken, and failing loudly
        (FileExistsError) beats silent clobber."""
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "xb") as f:
            f.write(data)

    def _remove(self, path: str) -> None:
        """DELETE: absent objects are fine (concurrent GC)."""
        try:
            os.remove(path)
        except FileNotFoundError:
            pass

    # -- manifest protocol (storage-agnostic) --------------------------------
    def _prefix(self, name: str) -> str:
        return self.path(name)

    def _versions(self, name: str) -> list[tuple[int, str]]:
        """(version, path) newest-first from a LIST of the prefix."""
        d = self._prefix(name)
        out = []
        for f in self.listdir(name):
            if f.startswith("state-") and f.endswith(".json"):
                try:
                    out.append((int(f[6:-5]), f"{d}/{f}"))
                except ValueError:
                    continue
        out.sort(reverse=True)
        return out

    def _read_newest(self, name: str) -> dict | None:
        for _, p in self._versions(name):
            try:
                return json.loads(self._read_bytes(p))
            except (FileNotFoundError, json.JSONDecodeError):
                continue  # torn/failed PUT: fall back to previous version
        return None

    def _put_next(self, name: str, doc: dict) -> None:
        versions = self._versions(name)
        nxt = (versions[0][0] + 1) if versions else 0
        d = self._prefix(name)
        self._create_new(
            f"{d}/state-{nxt:020d}.json", json.dumps(doc).encode("utf-8")
        )
        for v, p in versions[self.KEEP_MANIFESTS - 1 :]:
            self._remove(p)

    def read_state(self) -> dict | None:
        return self._read_newest("manifest")

    def commit_state(self, state: dict) -> None:
        self._put_next("manifest", state)

    def read_doc(self, name: str) -> dict | None:
        return self._read_newest(f"docs-{name}")

    def write_doc(self, name: str, doc: dict) -> None:
        self._put_next(f"docs-{name}", doc)


class HadoopFsStateStore(ManifestStateStore):
    """The manifest protocol bound to the Hadoop ``FileSystem`` API via
    the JVM Spark already runs, so the store root can be ANY URI the
    cluster's Hadoop client resolves — ``hdfs://``, ``s3a://``,
    ``gs://``, ``abfss://``, ``file://`` — instead of an ``os.*`` local
    path. This is the deployment binding for the protocol the local
    stores prove: the reference keeps this state inside the Informix
    server for free transactional atomicity (``sql/informixcdc.sql:
    7-38``); a cluster deployment gets the same guarantee from
    create-new (``FileSystem.create(path, overwrite=false)`` — the
    PUT-new analog), LIST (``listStatus``) and DELETE — never rename.

    Atomicity caveat: the loud-``FileExistsError`` double-writer
    protection holds only on filesystems whose exclusive create is
    atomic (HDFS, ``file://``, ``abfss://``). S3A's
    ``create(overwrite=false)`` is a non-atomic existence-check then
    PUT (the object appears at close), so on ``s3a://`` two racing
    writers can both "win" — there the protocol's safety rests on the
    manifest versioning (newest-parseable-wins, torn writes never
    corrupt an old pointer) plus the deployment's single-writer
    contract, not on create-new exclusivity.

    ``path()`` returns fully-qualified URIs, so the engine's Spark
    parquet IO (snapshots, index segments) rides the same remote
    filesystem as the pointer. Constructed lazily off the active
    SparkSession's Hadoop configuration (credentials, endpoints, and
    committers come from the session, as they should).
    """

    def __init__(self, root: str, spark=None):
        if spark is None:
            from pyspark.sql import SparkSession

            # getActiveSession is THREAD-local: a store constructed on a
            # driver worker thread (overlap_jobs construction, threaded
            # tests) sees None there even though the process has exactly
            # one session — fall back to the process-wide instantiated
            # session before giving up
            spark = SparkSession.getActiveSession() or getattr(
                SparkSession, "_instantiatedSession", None
            )
            if spark is None:
                raise ValueError(
                    "HadoopFsStateStore needs a SparkSession (for the JVM "
                    "Hadoop client); pass spark= or start a session first"
                )
        jvm = spark._jvm
        self._jvm = jvm
        self._jPath = jvm.org.apache.hadoop.fs.Path
        self._jroot = self._jPath(root)
        self._fs = self._jroot.getFileSystem(
            spark._jsc.hadoopConfiguration()
        )
        # fully-qualified so Spark IO resolves the same scheme/authority
        self.root = str(self._fs.makeQualified(self._jroot))
        self._fs.mkdirs(self._jPath(self.root))

    # -- base fs surface over the Hadoop client ------------------------------
    def path(self, *parts: str) -> str:
        return "/".join((self.root.rstrip("/"), *parts))

    def listdir(self, *parts: str) -> list[str]:
        p = self._jPath(self.path(*parts))
        if not self._fs.exists(p):
            return []
        return [st.getPath().getName() for st in self._fs.listStatus(p)]

    def exists(self, *parts: str) -> bool:
        return bool(self._fs.exists(self._jPath(self.path(*parts))))

    def delete_tree(self, *parts: str) -> None:
        self._fs.delete(self._jPath(self.path(*parts)), True)

    # -- storage primitives ---------------------------------------------------
    def _read_bytes(self, path: str) -> bytes:
        try:
            stream = self._fs.open(self._jPath(path))
        except Exception as e:
            if _is_java_exc(e, "FileNotFoundException"):
                raise FileNotFoundError(path) from None
            raise
        try:
            # commons-io ships on Spark's classpath; py4j maps the
            # returned byte[] to Python bytes
            return bytes(
                self._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
            )
        finally:
            stream.close()

    def _create_new(self, path: str, data: bytes) -> None:
        try:
            out = self._fs.create(self._jPath(path), False)  # overwrite=False
        except Exception as e:
            if _is_java_exc(e, "FileAlreadyExistsException", "already exists"):
                raise FileExistsError(path) from None
            raise
        try:
            out.write(bytearray(data))
        finally:
            out.close()

    def _remove(self, path: str) -> None:
        self._fs.delete(self._jPath(path), False)


def segment_schema(
    schema_json: str | None, bucketed: bool, partition_field: str = "_bkt"
):
    """Rebuild a segment's explicit read schema from the JSON the index
    stored in its pointer document at write time, or None (pre-round-11
    state docs) to fall back to parquet footer inference.

    Shared by the three incremental indexes (dedup bands, ANN cells,
    BM25 postings): each stores its segments' DATA-column schema once —
    captured from the actually-written DataFrame, so it reproduces
    exactly what Spark's own reader would infer — and reads pass it
    explicitly, skipping the footer-read inference job per
    ``spark.read.parquet`` call. ``bucketed`` segments (an entry in the
    index's ``segment_buckets`` map, even a stale layout from a
    since-changed fan-out) carry the integer ``partition_field``
    partition column (``_bkt`` for the term/band layouts, ``cell`` for
    the ANN index); flat segments were written without it."""
    if not schema_json:
        return None
    from pyspark.sql.types import IntegerType, StructField, StructType

    data = StructType.fromJson(json.loads(schema_json))
    if bucketed:
        return StructType(
            data.fields + [StructField(partition_field, IntegerType())]
        )
    return data


def _is_java_exc(e: Exception, *needles: str) -> bool:
    """True when a py4j-wrapped Java exception (or its message) names
    any of ``needles`` — used to normalize Hadoop's exceptions onto the
    Python builtins the StateStore contract promises."""
    j = getattr(e, "java_exception", None)
    if j is None:
        return False
    text = f"{j.getClass().getName()} {j.getMessage() or ''}"
    return any(n in text for n in needles)
