"""StateStore protocol tests: the rename-free ManifestStateStore must
give the same pointer semantics as the Posix store while using only
object-store-safe primitives (PUT-new, LIST, DELETE — never rename or
in-place overwrite), plus crash-tolerance the local store gets from
atomic rename."""

from __future__ import annotations

import os

import pytest

from informixcdc_spark.streaming.statestore import (
    ManifestStateStore,
    PosixStateStore,
)


@pytest.mark.parametrize("cls", [PosixStateStore, ManifestStateStore])
def test_pointer_roundtrip_and_docs(tmp_path, cls):
    store = cls(str(tmp_path / "s"))
    assert store.read_state() is None
    store.commit_state({"batch_id": 0, "buckets": {"3": 0}})
    store.commit_state({"batch_id": 1, "buckets": {"3": 1}})
    assert store.read_state() == {"batch_id": 1, "buckets": {"3": 1}}
    # a fresh handle over the same root sees the committed pointer
    assert cls(str(tmp_path / "s")).read_state()["batch_id"] == 1
    # side documents are independent of the pointer
    assert store.read_doc("registry") is None
    store.write_doc("registry", {"epochs": [1, 2]})
    store.write_doc("registry", {"epochs": [1, 2, 3]})
    assert store.read_doc("registry") == {"epochs": [1, 2, 3]}
    assert store.read_state()["batch_id"] == 1


def test_manifest_store_never_renames_or_overwrites(tmp_path):
    """Every commit creates a NEW manifest object; old versions stay
    byte-identical until GC'd — the invariant that makes the protocol
    valid on storage without atomic rename."""
    store = ManifestStateStore(str(tmp_path / "s"))
    store.commit_state({"batch_id": 0})
    (first,) = os.listdir(store.path("manifest"))
    before = open(store.path("manifest", first), "rb").read()
    store.commit_state({"batch_id": 1})
    names = sorted(os.listdir(store.path("manifest")))
    assert first in names and len(names) == 2
    assert open(store.path("manifest", first), "rb").read() == before


def test_manifest_store_prunes_old_versions(tmp_path):
    store = ManifestStateStore(str(tmp_path / "s"))
    for b in range(10):
        store.commit_state({"batch_id": b})
    names = os.listdir(store.path("manifest"))
    assert len(names) <= ManifestStateStore.KEEP_MANIFESTS
    assert store.read_state() == {"batch_id": 9}


def test_manifest_store_torn_write_falls_back(tmp_path):
    """A manifest torn by a crash mid-write (impossible on a real object
    store — PUT is all-or-nothing — but possible in local emulation)
    must be skipped, exposing the previous committed state, exactly the
    state a crashed-before-PUT writer leaves."""
    store = ManifestStateStore(str(tmp_path / "s"))
    store.commit_state({"batch_id": 0, "ok": True})
    # simulate the torn write: a newer manifest with truncated JSON
    with open(store.path("manifest", f"state-{1:020d}.json"), "w") as f:
        f.write('{"batch_id": 1, "ok"')
    assert store.read_state() == {"batch_id": 0, "ok": True}
    # the next commit supersedes the torn object
    store.commit_state({"batch_id": 1, "ok": True})
    assert store.read_state()["batch_id"] == 1


def test_manifest_store_duplicate_version_fails_loudly(tmp_path):
    """Two writers racing to the same version must not silently clobber:
    the second PUT of state-N fails (single-writer contract violation)."""
    a = ManifestStateStore(str(tmp_path / "s"))
    b = ManifestStateStore(str(tmp_path / "s"))
    a.commit_state({"batch_id": 0, "writer": "a"})
    # b raced: it LISTed before a's PUT landed (stale empty listing),
    # so it picks the same version 0 — its create-new PUT must fail
    b._versions = lambda name: []
    with pytest.raises(FileExistsError):
        b.commit_state({"batch_id": 0, "writer": "b"})
    assert a.read_state()["writer"] == "a"


# -- Hadoop FileSystem binding (the deployment client) -----------------------


def _hadoop(root: str, spark):
    from informixcdc_spark.streaming.statestore import HadoopFsStateStore

    return HadoopFsStateStore("file://" + root, spark=spark)


def test_hadoopfs_pointer_roundtrip_and_docs(tmp_path, spark):
    """The manifest protocol over the Hadoop FileSystem client (URI
    root) gives the same pointer + side-doc semantics as the local
    stores — the round-6 deployment binding."""
    root = str(tmp_path / "s")
    store = _hadoop(root, spark)
    assert store.read_state() is None
    store.commit_state({"batch_id": 0, "buckets": {"3": 0}})
    store.commit_state({"batch_id": 1, "buckets": {"3": 1}})
    assert store.read_state() == {"batch_id": 1, "buckets": {"3": 1}}
    assert _hadoop(root, spark).read_state()["batch_id"] == 1
    assert store.read_doc("registry") is None
    store.write_doc("registry", {"epochs": [1, 2]})
    store.write_doc("registry", {"epochs": [1, 2, 3]})
    assert store.read_doc("registry") == {"epochs": [1, 2, 3]}
    assert store.read_state()["batch_id"] == 1


def test_hadoopfs_store_contract(tmp_path, spark):
    """PUT-new / LIST / DELETE discipline through the Hadoop client:
    commits never rewrite an existing manifest, old versions prune
    behind the keep-window, a torn manifest falls back to the previous
    committed state, a duplicate version fails loudly, and Spark
    parquet IO round-trips through store.path() URIs."""
    import json

    from informixcdc_spark.streaming.statestore import ManifestStateStore

    root = str(tmp_path / "s")
    store = _hadoop(root, spark)
    for b in range(10):
        store.commit_state({"batch_id": b})
    names = store.listdir("manifest")
    assert len(names) <= ManifestStateStore.KEEP_MANIFESTS
    assert store.read_state() == {"batch_id": 9}

    # torn write: a NEWER manifest with truncated JSON is skipped
    torn = os.path.join(root, "manifest", f"state-{10**9:020d}.json")
    with open(torn, "w") as f:
        f.write('{"batch_id": 99, "ok"')
    assert store.read_state() == {"batch_id": 9}
    store.commit_state({"batch_id": 10})
    assert store.read_state() == {"batch_id": 10}

    # duplicate version (stale LIST race: b's listing missed the newest
    # manifest, so it picks the same next-version) must not clobber
    b = _hadoop(root, spark)
    real_versions = b._versions

    b._versions = lambda name: real_versions(name)[1:]
    with pytest.raises(FileExistsError):
        b.commit_state({"batch_id": 0, "writer": "b"})

    # snapshot IO rides the same filesystem via URIs
    spark.range(7).write.mode("overwrite").parquet(store.path("snap", "v0"))
    assert spark.read.parquet(store.path("snap", "v0")).count() == 7
    assert store.exists("snap", "v0")
    store.delete_tree("snap", "v0")
    assert not store.exists("snap", "v0")

    # the committed bytes are honest JSON (read through the client)
    newest = sorted(store.listdir("manifest"))[-1]
    doc = json.loads(store._read_bytes(store.path("manifest", newest)))
    assert doc["batch_id"] == 10
