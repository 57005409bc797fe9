"""Pluggable DATA-PLANE storage for snapshot tables.

The snapshot layer talks to storage through exactly two seams:

- :class:`~dask_awkward_spark.sources.snapshot.CommitBackend` — the one
  CONTENDED primitive (atomic create-if-absent of a version manifest);
- :class:`StorageBackend` (this module) — every RACE-FREE file
  operation the metadata/management plane performs: manifest/sidecar
  byte reads, whole-object publishes, staged-data-file publication,
  listing, GC deletes, and staleness stats.

Splitting the planes mirrors Delta's LogStore (contended) vs Hadoop
FileSystem (data) split: the commit primitive needs a per-store
mutual-exclusion story, while everything here maps to plain object
PUT/GET/LIST/DELETE/COPY.

Two backends ship:

- ``posix`` (default) — POSIX/HDFS-style stores. Staged data files are
  published by HARD LINK (create + atomic, no byte copy); directories
  are real and empty ones are pruned.
- ``object-copy`` — a local-filesystem EMULATION of object-store
  semantics for stores with none of that: no hard links anywhere
  (publication is a byte copy finished by an atomic whole-object
  swap, i.e. a PUT — S3 CopyObject/upload), no ``mkdir`` contract
  (parents appear as a side effect of PUT, as key prefixes do),
  no empty-directory handling (object stores have no directories),
  and cache signatures from (mtime, size) — the ETag/generation
  stand-in — never inode numbers. Running the full snapshot battery
  under this backend proves the DML surface never relies on a POSIX
  capability an object store lacks.

The Spark/pyarrow DATA path (parquet scans of ``data/``, DV parquet
reads, checkpoint-sidecar scans) deliberately does NOT route through
this seam: on a real cluster those reads ride Spark's Hadoop
FileSystem / fsspec layer (s3a://, gs://), which is already pluggable
at the engine level. This seam covers the driver-side Python file ops
that previously hard-coded os.link/os.walk/os.replace/open().

Select with ``DAK_SNAPSHOT_STORAGE_BACKEND`` (``posix`` |
``object-copy``) or :func:`set_storage_backend`.

Reference parity: dask-awkward delegates ALL storage to fsspec
(reference ``src/dask_awkward/lib/io/parquet.py``); this engine owns a
table LAYOUT (manifest log + immutable data files), so it needs the
explicit primitive inventory an object-store port must map.
"""
from __future__ import annotations

import os
import shutil
import uuid


class StorageBackend:
    """Race-free storage primitive inventory for the snapshot layer.

    Path arguments are plain strings in the table's namespace; every
    mutation is either idempotent or confined to a unique name, so no
    operation here needs the commit plane's mutual exclusion.
    """

    name = "?"

    # ---- reads ----
    def read_bytes(self, path: str) -> bytes:
        """GET: full object bytes. FileNotFoundError if absent."""
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def mtime(self, path: str) -> float:
        """Last-modified epoch seconds. FileNotFoundError if absent."""
        raise NotImplementedError

    def size(self, path: str) -> int:
        raise NotImplementedError

    def stat_sig(self, path: str) -> tuple:
        """An opaque signature that CHANGES whenever the object at
        ``path`` is replaced by different content — the manifest
        cache's freshness key (ETag/generation on a real store).
        FileNotFoundError if absent."""
        raise NotImplementedError

    def list_dir(self, path: str) -> "list[str]":
        """Immediate child NAMES under ``path`` (one LIST page with
        delimiter); [] when nothing is there."""
        raise NotImplementedError

    def walk_files(self, root: str) -> "list[tuple[str, str]]":
        """Every file under ``root`` recursively as sorted
        ``('/'-relative path, full path)`` pairs — a prefix LIST.
        [] when nothing is there."""
        raise NotImplementedError

    # ---- writes ----
    def put_atomic(self, path: str, data: bytes) -> None:
        """Whole-object PUT, overwrite allowed: readers serialize to
        none-or-all — never torn content. Parents appear as needed."""
        raise NotImplementedError

    def put_file_atomic(self, src_local: str, dst: str) -> None:
        """Publish the LOCAL file ``src_local`` at ``dst`` with PUT
        visibility. ``dst`` is always a fresh unique name (staged data
        files, checkpoint sidecars), so overwrite semantics are moot;
        the source must remain readable afterwards (copy semantics —
        backends may hard-link when the store allows it)."""
        raise NotImplementedError

    def delete(self, path: str) -> None:
        """DELETE, idempotent: missing objects are not an error."""
        raise NotImplementedError

    def delete_prefix(self, root: str) -> None:
        """Recursive delete of everything under ``root``; idempotent."""
        raise NotImplementedError

    def ensure_dir(self, path: str) -> None:
        """POSIX stores need parents created before linking; object
        stores have no directories — their backends no-op."""
        raise NotImplementedError

    def prune_empty_dirs(self, root: str) -> None:
        """Housekeeping after GC: remove now-empty directories under
        ``root`` (never ``root`` itself). Object stores no-op — empty
        prefixes don't exist."""
        raise NotImplementedError


class _LocalFilesystemBase(StorageBackend):
    """Shared local-filesystem plumbing for both shipped backends — the
    nine operations whose LOCAL implementation is identical either way
    (byte reads, existence/staleness stats, listing, whole-object PUT
    via tmp-write + atomic replace, deletes). Only the four operations
    where POSIX and object-store SEMANTICS genuinely diverge — stat
    signatures, staged-file publication, directory creation, empty-dir
    pruning — live in the subclasses, so a fix to the common plumbing
    can never drift between them."""

    def read_bytes(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def mtime(self, path: str) -> float:
        return os.lstat(path).st_mtime

    def size(self, path: str) -> int:
        return os.path.getsize(path)

    def list_dir(self, path: str) -> "list[str]":
        if not os.path.isdir(path):
            return []
        return sorted(os.listdir(path))

    def walk_files(self, root: str) -> "list[tuple[str, str]]":
        if not os.path.isdir(root):
            return []
        out = []
        for dirpath, _dirs, names in os.walk(root):
            for name in names:
                full = os.path.join(dirpath, name)
                rel = os.path.relpath(full, root).replace(os.sep, "/")
                out.append((rel, full))
        return sorted(out)

    def put_atomic(self, path: str, data: bytes) -> None:
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
        try:
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def delete(self, path: str) -> None:
        try:
            os.unlink(path)
        except FileNotFoundError:
            pass

    def delete_prefix(self, root: str) -> None:
        shutil.rmtree(root, ignore_errors=True)


class PosixStorageBackend(_LocalFilesystemBase):
    """POSIX / HDFS-style stores: hard-link publication (no byte copy),
    real directories, inode-bearing stat signatures."""

    name = "posix"

    def stat_sig(self, path: str) -> tuple:
        # inode + mtime_ns + size: an rmtree+recreate at the same path
        # within one mtime tick would additionally need inode reuse AND
        # byte-identical length before stale cache content could serve
        st = os.stat(path)
        return (st.st_ino, st.st_mtime_ns, st.st_size)

    def put_file_atomic(self, src_local: str, dst: str) -> None:
        # link, not rename: a crash mid-publication leaves only
        # unreferenced garbage for vacuum, and the staged source stays
        # readable for the caller's footer-stats pass
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        try:
            os.link(src_local, dst)
        except OSError as e:
            import errno

            if e.errno != errno.EXDEV:
                raise
            # cross-device source (a caller staged on another mount):
            # fall back to copy + atomic swap — same visibility contract
            d = os.path.dirname(dst)
            tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
            try:
                shutil.copyfile(src_local, tmp)
                os.replace(tmp, dst)
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)

    def ensure_dir(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def prune_empty_dirs(self, root: str) -> None:
        if not os.path.isdir(root):
            return
        for dirpath, _dirs, _names in os.walk(root, topdown=False):
            if dirpath != root and not os.listdir(dirpath):
                try:
                    os.rmdir(dirpath)
                except OSError:
                    pass


class ObjectCopyStorageBackend(_LocalFilesystemBase):
    """Object-store semantics emulated on the local filesystem: every
    operation is restricted to what PUT/GET/LIST/DELETE/COPY offer.

    - NO hard links: :meth:`put_file_atomic` byte-copies to a unique
      temp then swaps it in atomically — a completed whole-object PUT.
      A deployment replaces the copy with S3 CopyObject / a multipart
      upload; everything above this seam is unchanged.
    - NO directory contract: :meth:`ensure_dir` and
      :meth:`prune_empty_dirs` are no-ops (prefixes aren't objects).
      The local substrate still needs parents to exist for the
      emulation to write at all, so puts create them as a side effect —
      exactly how a key's prefix springs into existence on PUT.
    - Stat signatures carry (mtime_ns, size) only — the ETag /
      generation stand-in; inode numbers don't exist on a real store
      and nothing above the seam may depend on them.
    """

    name = "object-copy"

    def stat_sig(self, path: str) -> tuple:
        st = os.stat(path)
        return (st.st_mtime_ns, st.st_size)

    def put_file_atomic(self, src_local: str, dst: str) -> None:
        d = os.path.dirname(dst)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
        try:
            shutil.copyfile(src_local, tmp)  # the COPY — never a link
            os.replace(tmp, dst)  # PUT visibility: none-or-all
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def ensure_dir(self, path: str) -> None:
        pass  # no directory objects; puts create their own parents

    def prune_empty_dirs(self, root: str) -> None:
        pass  # empty prefixes don't exist on an object store


_STORAGE_BACKENDS = {
    b.name: b for b in (PosixStorageBackend(), ObjectCopyStorageBackend())
}
_ACTIVE: StorageBackend = _STORAGE_BACKENDS[
    os.environ.get("DAK_SNAPSHOT_STORAGE_BACKEND", PosixStorageBackend.name)
]


def active() -> StorageBackend:
    """The storage backend every snapshot data-plane op routes through."""
    return _ACTIVE


def set_storage_backend(backend: "StorageBackend | str") -> StorageBackend:
    """Swap the data-plane backend; returns the previous one (tests
    restore it). Accepts an instance or a registered name."""
    global _ACTIVE
    prev = _ACTIVE
    if isinstance(backend, str):
        backend = _STORAGE_BACKENDS[backend]
    _ACTIVE = backend
    return prev
