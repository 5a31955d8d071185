"""Transcript sources — the reader surface (SURVEY S1).

The reference consumes Osmosis's XML/PBF readers upstream (``--read-xml``,
integration/PluginIntegrationITest.java:24-26). The engine's primary source
is Parquet; JSON-lines is supported as the interchange analog of the
reference's XML path. Both normalize to TRANSCRIPT_SCHEMA with column
pruning at the read.
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data as rd

from .fixtures import TRANSCRIPT_SCHEMA


def _expand(paths: str | list[str], suffix: str) -> list[str]:
    out = []
    for p in [paths] if isinstance(paths, str) else list(paths):
        if os.path.isdir(p):
            out.extend(
                sorted(
                    os.path.join(p, f) for f in os.listdir(p) if f.endswith(suffix)
                )
            )
        else:
            out.append(p)
    return out


def _normalize(ds: rd.Dataset) -> rd.Dataset:
    """Cast/order columns to TRANSCRIPT_SCHEMA (drops extras, validates)."""

    def fix(batch: pa.Table) -> pa.Table:
        cols = {}
        for field in TRANSCRIPT_SCHEMA:
            if field.name not in batch.column_names:
                raise ValueError(f"transcript source missing column {field.name!r}")
            col = batch[field.name]
            if col.type != field.type:
                col = col.cast(field.type)
            cols[field.name] = col
        return pa.table(cols)

    return ds.map_batches(fix, batch_format="pyarrow", zero_copy_batch=True)


def read_transcripts_parquet(
    paths: str | list[str], columns: list[str] | None = None
) -> rd.Dataset:
    files = _expand(paths, ".parquet")
    return rd.read_parquet(files, columns=columns)


def read_transcripts_json(paths: str | list[str]) -> rd.Dataset:
    """JSON-lines source (one turn object per line); timestamps may arrive
    as ISO strings or epoch micros — normalized to timestamp[us]."""
    files = _expand(paths, ".jsonl") or _expand(paths, ".json")

    def fix_ts(batch: pa.Table) -> pa.Table:
        ts = batch["ts"]
        if pa.types.is_integer(ts.type):
            ts = ts.cast(pa.timestamp("us"))
        elif pa.types.is_string(ts.type):
            import pyarrow.compute as pc

            # ISO strings may or may not carry fractional seconds — both are
            # valid interchange shapes (and may be mixed row-to-row). Arrow's
            # native ISO-8601 timestamp cast accepts both (strptime's %f is
            # not supported by Arrow at all); unparseable rows raise.
            ts = pc.cast(ts, pa.timestamp("us"))
        batch = batch.drop_columns(["ts"]).append_column("ts", ts)
        return batch

    ds = rd.read_json(files).map_batches(
        fix_ts, batch_format="pyarrow", zero_copy_batch=True
    )
    return _normalize(ds)
