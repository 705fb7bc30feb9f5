"""Cloud sink backend protocol — W6's upload half as a pluggable seam.

The reference uploads every projected CSV to Google Drive through a
small backend surface (reference core/cloud.py:14-20: a client wrapper
exposing folder-ensure + file-upload; cloud.py:30-78: the Drive
implementation with per-origin folder routing and a folder cache, T4).
The sandbox can hold no credentials, so this module ships the PROTOCOL
plus a local-filesystem implementation with identical semantics; a
production backend (Drive, S3, GCS) is a config swap — implement
:class:`CloudBackend` and pass it to the CLI / ``upload_routed``.

Drive field mapping (for a real backend implementation):

=====================  =============================================
protocol concept       Drive API equivalent (reference cloud.py)
=====================  =============================================
``ensure_folder(name)``  files().create(body={"name": name,
                         "mimeType": ".../folder"}) after a files()
                         .list() lookup; returns the folder **id**;
                         cache it per run (cloud.py:70-78, T4)
``upload(path, folder)`` files().create(body={"name": ..., "parents":
                         [folder_id]}, media_body=MediaFileUpload(
                         path, mimetype=...)); returns the file id
``mimetype``             MediaFileUpload mimetype; infer with
                         functions.urlnorm.infer_mimetype when absent
=====================  =============================================

Scale note: uploads happen once per (origin, run) for driver-small
projected outputs — never on the per-batch data path. Bulk data uses
the partitioned Parquet sinks (functions/project.py), which are the
resumable 100 TB path; this protocol is the reference-compatible
"deliver the report file" edge.
"""

from __future__ import annotations

import os
import shutil
from typing import Protocol, runtime_checkable


@runtime_checkable
class CloudBackend(Protocol):
    """The backend surface scrapers deliver through (W6)."""

    def ensure_folder(self, name: str, parent: str | None = None) -> str:
        """Return a folder handle (Drive: folder id; local: dir path),
        creating the folder on first use and caching it (T4).
        ``parent``: nest under an existing folder handle (Drive: the
        parent folder id in ``parents``; local: the parent dir)."""
        ...

    def upload(self, local_path: str, folder: str, *,
               name: str | None = None,
               mimetype: str | None = None) -> str:
        """Deliver ``local_path`` into ``folder``; returns the remote
        handle (Drive: file id; local: destination path)."""
        ...


class LocalFolderBackend:
    """Filesystem implementation of :class:`CloudBackend`: one directory
    per origin under ``root`` (the local analog of the reference's
    per-origin Drive folders), with the same create-once folder cache.
    """

    def __init__(self, root: str):
        self.root = root
        self._folders: dict[str, str] = {}  # T4: makedirs once per origin
        self.uploads: list[tuple[str, str]] = []  # lineage: (src, dest)

    def ensure_folder(self, name: str, parent: str | None = None) -> str:
        key = f"{parent or self.root}/{name}"
        path = self._folders.get(key)
        if path is None:
            path = os.path.join(parent or self.root, name)
            os.makedirs(path, exist_ok=True)
            self._folders[key] = path
        return path

    def upload(self, local_path: str, folder: str, *,
               name: str | None = None,
               mimetype: str | None = None) -> str:
        dest = os.path.join(folder, name or os.path.basename(local_path))
        if os.path.abspath(local_path) != os.path.abspath(dest):
            shutil.copyfile(local_path, dest)
        self.uploads.append((local_path, dest))
        return dest


def upload_routed(backend: CloudBackend, local_path: str, origin: str,
                  *, mimetype: str | None = None) -> str:
    """The reference's deliver step (scraper.py: write local CSV ->
    cloud.upload into the origin's folder) as one call: ensure the
    origin folder (cached), upload, return the remote handle."""
    if mimetype is None and os.path.isfile(local_path):
        try:
            import pyarrow as pa

            from ..functions.urlnorm import infer_mimetypes

            with open(local_path, "rb") as f:
                head = f.read(64)
            mimetype = infer_mimetypes(
                pa.array([local_path], pa.string()),
                pa.array([head], pa.binary()),
            )[0].as_py()
        except Exception:
            mimetype = None
    folder = backend.ensure_folder(origin)
    if os.path.isdir(local_path):
        # streamed CSV outputs are part directories (project.py:
        # write_projected_csv); deliver as a nested folder of parts —
        # the Drive analog is a subfolder with one upload per part
        sub = backend.ensure_folder(os.path.basename(local_path),
                                    parent=folder)
        for f in sorted(os.listdir(local_path)):
            backend.upload(os.path.join(local_path, f), sub,
                           mimetype=mimetype)
        return sub
    return backend.upload(local_path, folder, mimetype=mimetype)
