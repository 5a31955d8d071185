"""Checkpoint manifest + atomic publish.

The reference has NO checkpointing — ``IndexAdminService.createIndex`` drops
any existing index on every run (``service/IndexAdminService.java:22``) and a
crash means full restart. The north rule requires the opposite: "resumable
from checkpoint with per-partition lineage + metrics". Design:

  index_dir/
    _checkpoints/<stage>/<unit>.json   one small JSON per COMPLETED unit
                                       (docstore partition / postings bucket),
                                       written atomically (tmp+rename) AFTER
                                       the unit's data file is renamed in
    manifest.json                      final atomic publish (analog of ES
                                       ``refresh``, IndexAdminService.java:80-83):
                                       readers only trust a published manifest

A resumed run (config.resume=True) skips any unit whose checkpoint exists.
Unit data files are themselves written tmp+rename, so a killed run leaves
either (file absent, ckpt absent) or (file present, ckpt maybe absent) —
re-running the unit overwrites the file deterministically, the idempotency
the reference gets from ES index-by-_id upserts (dao/EntityDao.java:96,114).
"""

from __future__ import annotations

import json
import os
import uuid


def _atomic_write_json(path: str, obj: dict) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(obj, f, sort_keys=True)
    os.replace(tmp, path)


def atomic_write_bytes(path: str, data: bytes) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def checkpoint_path(index_dir: str, stage: str, unit: str) -> str:
    return os.path.join(index_dir, "_checkpoints", stage, f"{unit}.json")


def checkpoint_done(index_dir: str, stage: str, unit: str) -> bool:
    return os.path.exists(checkpoint_path(index_dir, stage, unit))


def write_checkpoint(index_dir: str, stage: str, unit: str, info: dict) -> None:
    path = checkpoint_path(index_dir, stage, unit)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    _atomic_write_json(path, {"stage": stage, "unit": unit, **info})


def read_checkpoints(index_dir: str, stage: str) -> dict[str, dict]:
    d = os.path.join(index_dir, "_checkpoints", stage)
    out: dict[str, dict] = {}
    if not os.path.isdir(d):
        return out
    for name in sorted(os.listdir(d)):
        if name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                out[name[:-5]] = json.load(f)
    return out


MANIFEST_NAME = "manifest.json"


def publish_manifest(index_dir: str, manifest: dict) -> str:
    """Atomic publish — the ``refresh`` analog. Readers must go through this."""
    path = os.path.join(index_dir, MANIFEST_NAME)
    _atomic_write_json(path, manifest)
    return path


def load_manifest(index_dir: str) -> dict:
    path = os.path.join(index_dir, MANIFEST_NAME)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"no published manifest at {path} — index incomplete or never built"
        )
    with open(path) as f:
        return json.load(f)
