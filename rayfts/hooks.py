"""Post-build extension surface — the reference's AbstractIndexBuilder hooks.

Reference (SURVEY X1): ``builder/AbstractIndexBuilder.java:10-82`` — user
subclasses registered by class name in config (reflective load at
``ElasticSearchWriterFactory.java:106-125``), each building a specialized
index named ``<index>-<suffix>`` AFTER the main index completes
(``ElasticSearchWriterTask.java:58-74``); the first failure ABORTS the
remaining builders (``break`` at :69-72) — that semantic is preserved here.

Ours: an ``IndexBuilder`` has ``name`` and ``build(ctx) -> artifact_path``;
``run_builders`` resolves dotted paths (the reflective-load analog), times
each build (ref logs elapsed ms at :65-68), and stops at the first failure.
"""

from __future__ import annotations

import importlib
import logging
import os
import time
from dataclasses import dataclass

from .config import IndexJobConfig
from .manifest import load_manifest

logger = logging.getLogger(__name__)


@dataclass
class BuilderContext:
    """What a builder gets — the Endpoint analog (utils/Endpoint.java:13-17):
    access to the published index + config instead of an ES client/DAO."""

    index_dir: str
    manifest: dict
    config: IndexJobConfig

    def artifact_dir(self, suffix: str) -> str:
        # ref naming: "<index>-<suffix>" (AbstractIndexBuilder.java:24-26)
        d = os.path.join(self.index_dir, "builders", suffix)
        os.makedirs(d, exist_ok=True)
        return d


def _resolve(spec):
    """Dotted-path -> builder instance (ref reflective instantiation)."""
    if isinstance(spec, str):
        mod, _, cls = spec.rpartition(".")
        spec = getattr(importlib.import_module(mod), cls)()
    return spec


def run_builders(index_dir: str, builders: list, cfg: IndexJobConfig | None = None):
    """Run post-build hooks sequentially; first failure aborts the rest.

    Returns list of {name, status, elapsed_sec, artifact|error} — one entry
    per builder attempted (aborted builders are absent, matching the
    reference's break-out-of-loop behavior).
    """
    ctx = BuilderContext(index_dir, load_manifest(index_dir), cfg or IndexJobConfig())
    results = []
    for spec in builders:
        b = _resolve(spec)
        t0 = time.perf_counter()
        try:
            artifact = b.build(ctx)
            results.append(
                {
                    "name": b.name,
                    "status": "ok",
                    "elapsed_sec": round(time.perf_counter() - t0, 3),
                    "artifact": artifact,
                }
            )
        except Exception as ex:  # noqa: BLE001 — ref logs & aborts remaining
            logger.error("index builder %s failed: %s", getattr(b, "name", spec), ex)
            results.append(
                {
                    "name": getattr(b, "name", str(spec)),
                    "status": "error",
                    "elapsed_sec": round(time.perf_counter() - t0, 3),
                    "error": str(ex),
                }
            )
            break  # ElasticSearchWriterTask.java:69-72
    return results


class ToolSubIndexBuilder:
    """Shipped example builder (extension-surface proof): one filtered
    sub-index per distinct non-null ``tool`` value — the analog of the
    reference's specialized ``<index>-<suffix>`` indices."""

    name = "tool-subindex"

    def build(self, ctx: BuilderContext) -> str:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        out = ctx.artifact_dir(self.name)
        docstore = os.path.join(ctx.index_dir, "docstore")
        t = pq.read_table(docstore)
        if "tool" not in t.column_names:
            raise ValueError("docstore has no 'tool' column")
        tools = sorted(
            v for v in set(t["tool"].to_pylist()) if v is not None
        )
        for tool in tools:
            sub = t.filter(pc.equal(t["tool"], tool))
            pq.write_table(sub, os.path.join(out, f"tool={tool}.parquet"))
        with open(os.path.join(out, "_SUMMARY.json"), "w") as f:
            import json

            json.dump({"tools": tools, "rows": t.num_rows}, f)
        return out


class FailingBuilder:
    """Test helper: always raises (exercises the abort semantic)."""

    name = "failing"

    def build(self, ctx):
        raise RuntimeError("intentional failure")
