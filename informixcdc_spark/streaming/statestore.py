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
    """

    #: manifests retained behind the newest (readers that LISTed just
    #: before a commit can still open what they saw)
    KEEP_MANIFESTS = 4

    def _prefix(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _versions(self, name: str) -> list[tuple[int, str]]:
        """(version, path) newest-first from a LIST of the prefix."""
        d = self._prefix(name)
        out = []
        for f in self.listdir(name):
            if f.startswith("state-") and f.endswith(".json"):
                try:
                    out.append((int(f[6:-5]), os.path.join(d, f)))
                except ValueError:
                    continue
        out.sort(reverse=True)
        return out

    def _read_newest(self, name: str) -> dict | None:
        for _, p in self._versions(name):
            try:
                with open(p) as f:
                    return json.load(f)
            except (FileNotFoundError, json.JSONDecodeError):
                continue  # torn/failed PUT: fall back to previous version
        return None

    def _put_next(self, name: str, doc: dict) -> None:
        versions = self._versions(name)
        nxt = (versions[0][0] + 1) if versions else 0
        d = self._prefix(name)
        os.makedirs(d, exist_ok=True)
        # 'x' = create-new, the PUT analog: a versioned manifest is never
        # overwritten; a duplicate version means the single-writer
        # contract was broken, and failing loudly beats silent clobber
        with open(os.path.join(d, f"state-{nxt:020d}.json"), "x") as f:
            json.dump(doc, f)
        for v, p in versions[self.KEEP_MANIFESTS - 1 :]:
            try:
                os.remove(p)
            except FileNotFoundError:
                pass

    def read_state(self) -> dict | None:
        return self._read_newest("manifest")

    def commit_state(self, state: dict) -> None:
        self._put_next("manifest", state)

    def read_doc(self, name: str) -> dict | None:
        return self._read_newest(f"docs-{name}")

    def write_doc(self, name: str, doc: dict) -> None:
        self._put_next(f"docs-{name}", doc)
