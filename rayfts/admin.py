"""Index lifecycle admin — the IndexAdminService analog.

Reference (SURVEY S9/S10): ``service/IndexAdminService.java`` — createIndex
(drop-if-exists, :18-48), indexExists (:50-53), deleteIndex (:67-70),
refresh (:80-83). Here an index is a published directory; ``refresh`` is
the atomic manifest publish (readers only trust manifest-listed state).
Per-doc delete is out of scope for an immutable batch build — documented
limitation, like the reference dropping Relations/Bounds
(dao/EntityDao.java:80-85).
"""

from __future__ import annotations

import os
import shutil

from .manifest import MANIFEST_NAME, load_manifest, publish_manifest


def index_exists(index_dir: str) -> bool:
    """True only for a PUBLISHED index (manifest present) —
    IndexAdminService.indexExists analog."""
    return os.path.exists(os.path.join(index_dir, MANIFEST_NAME))


def delete_index(index_dir: str) -> bool:
    """Remove the whole index directory (IndexAdminService.deleteIndex)."""
    if os.path.isdir(index_dir):
        shutil.rmtree(index_dir)
        return True
    return False


def create_index_dir(index_dir: str, drop_existing: bool = True) -> str:
    """createIndex analog: drop-if-exists then create
    (IndexAdminService.java:22)."""
    if drop_existing:
        delete_index(index_dir)
    os.makedirs(index_dir, exist_ok=True)
    return index_dir


def refresh(index_dir: str) -> dict:
    """Re-publish the manifest (atomic rename) — the refresh analog: makes
    current on-disk state the visible state for new Searchers."""
    m = load_manifest(index_dir)
    publish_manifest(index_dir, m)
    return m
