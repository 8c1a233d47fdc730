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
