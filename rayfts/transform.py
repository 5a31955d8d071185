"""ES transform (pivot) analog: `PUT _transform` + `_start` — a pivot
of a source stream by group keys into a DEST summary store, with the
continuous-transform checkpoint rule (each run processes only source
rows newer than the stored checkpoint and MERGES per-group partials
into the dest). The reference's ES cluster offers this around the
plugin's sink; here the pivot is a Ray Data groupby and the dest is
partition-friendly parquet + an atomic checkpoint.

Aggregation set (integer-exact so incremental merge == full recompute,
bit for bit): count, value-cents sum, value-cents max. Group keys and
the checkpoint column are caller-chosen; the merge is associative by
construction, so N incremental runs over disjoint ts slices equal one
full pivot — pinned by test.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from .manifest import atomic_write_bytes

CHECKPOINT_NAME = "transform_checkpoint.json"
DEST_NAME = "dest.parquet"


def _pivot(ds: rd.Dataset, group_by: list[str]) -> pa.Table:
    """One exact pivot pass: map-side per-batch partials, one groupby.
    Returns (group keys..., n_events, sum_value_cents,
    max_value_cents) sorted by keys."""
    from ray.data.aggregate import Max, Sum

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                        pa.int64())
        g = pa.table({
            **{k: t[k] for k in group_by},
            "c": cents,
        }).group_by(group_by, use_threads=False).aggregate(
            [("c", "count"), ("c", "sum"), ("c", "max")]
        )
        return g.rename_columns(list(group_by) + ["n_p", "s_p", "m_p"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(group_by)
        .aggregate(Sum("n_p"), Sum("s_p"), Max("m_p"))
    )
    blocks = [b for b in ray.get(agg.to_arrow_refs()) if b.num_rows]
    t = pa.concat_tables(blocks) if blocks else pa.table({})
    if t.num_rows == 0:
        return pa.table({
            **{k: pa.array([], pa.string()) for k in group_by},
            "n_events": pa.array([], pa.int64()),
            "sum_value_cents": pa.array([], pa.int64()),
            "max_value_cents": pa.array([], pa.int64()),
        })
    out = pa.table({
        **{k: t[k] for k in group_by},
        "n_events": pc.cast(t["sum(n_p)"], pa.int64()),
        "sum_value_cents": pc.cast(t["sum(s_p)"], pa.int64()),
        "max_value_cents": pc.cast(t["max(m_p)"], pa.int64()),
    })
    return out.take(pc.sort_indices(
        out, sort_keys=[(k, "ascending") for k in group_by]
    ))


def _latest_rows(t: pa.Table, group_by: list[str], sort_col: str,
                 tiebreak_col: str) -> pa.Table:
    """One row per group_by key: max (sort_col, tiebreak_col). One
    lexsort + last-of-run gather — no per-key Python."""
    if t.num_rows == 0:
        return t
    us = pc.cast(t[sort_col], pa.int64()).combine_chunks().to_numpy()
    tb = t[tiebreak_col].combine_chunks().to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    codes = pc.dictionary_encode(
        t[group_by[0]].combine_chunks()
    ).indices.to_numpy(zero_copy_only=False).astype(np.int64)
    for k in group_by[1:]:
        c2 = pc.dictionary_encode(
            t[k].combine_chunks()
        ).indices.to_numpy(zero_copy_only=False).astype(np.int64)
        codes = codes * (int(c2.max(initial=0)) + 1) + c2
    order = np.lexsort((tb, us, codes))
    last = order[np.concatenate([
        np.flatnonzero(np.diff(codes[order]) != 0),
        [codes.size - 1],
    ])]
    return t.take(pa.array(np.sort(last), pa.int64()))


def latest_transform(events_path: str, group_by: list[str],
                     sort_col: str = "ts",
                     tiebreak_col: str = "event_id") -> pa.Table:
    """ES transform ``latest`` mode: one row per unique ``group_by``
    key — the newest source row by ``sort_col`` (ties broken by the
    max ``tiebreak_col``, pinned for determinism; ES uses ingest
    order, which a distributed read cannot reproduce). Map-side
    per-batch argmax partials (rows drop to one per observed key per
    batch), then the SAME rule once more on the driver over
    O(keys x map tasks) rows — the source never shuffles."""
    part = (
        rd.read_parquet(events_path)
        .map_batches(
            lambda t: _latest_rows(t, group_by, sort_col, tiebreak_col),
            batch_format="pyarrow",
        )
    )
    blocks = [b for b in ray.get(part.to_arrow_refs()) if b.num_rows]
    if not blocks:
        return pa.table({})
    out = _latest_rows(
        pa.concat_tables(blocks), group_by, sort_col, tiebreak_col
    )
    return out.take(pc.sort_indices(
        out, sort_keys=[(k, "ascending") for k in group_by]
    ))


def run_transform(events_path: str, dest_dir: str,
                  group_by: list[str], ts_col: str = "ts",
                  derive=None) -> dict:
    """Run (or continue) the transform: pivot only source rows with
    ``ts_col`` strictly newer than the stored checkpoint, merge the
    partials into the dest summary (count/sum add, max maxes), publish
    dest + checkpoint atomically. Returns {'rows_processed',
    'groups', 'checkpoint_us'}. A rerun with no new rows is a no-op
    (the ES continuous-transform idle checkpoint)."""
    os.makedirs(dest_dir, exist_ok=True)
    cp_path = os.path.join(dest_dir, CHECKPOINT_NAME)
    dest_path = os.path.join(dest_dir, DEST_NAME)
    last_us = -(1 << 62)
    if os.path.exists(cp_path):
        with open(cp_path) as f:
            last_us = int(json.load(f)["checkpoint_us"])

    ds = rd.read_parquet(events_path)

    def newer(t: pa.Table) -> pa.Table:
        us = pc.cast(t[ts_col], pa.int64())
        return t.filter(pc.greater(us, last_us))

    fresh = ds.map_batches(newer, batch_format="pyarrow")
    if derive is not None:
        # ES transform group_by supports derived buckets (e.g.
        # date_histogram keys); ``derive`` adds those columns
        fresh = fresh.map_batches(derive, batch_format="pyarrow")
    n_new = fresh.count()
    if n_new == 0:
        groups = pq.read_metadata(dest_path).num_rows \
            if os.path.exists(dest_path) else 0
        return {"rows_processed": 0, "groups": int(groups),
                "checkpoint_us": int(last_us)}
    # checkpoint in integer microseconds (naive-datetime .timestamp()
    # would apply the host timezone — never go through datetime here)
    new_max = int(fresh.map_batches(
        lambda t: pa.table({"us": pc.cast(t[ts_col], pa.int64())}),
        batch_format="pyarrow",
    ).max("us"))
    part = _pivot(fresh, group_by)
    if os.path.exists(dest_path):
        old = pq.read_table(dest_path)
        both = pa.concat_tables([old, part])
        g = both.group_by(group_by, use_threads=False).aggregate([
            ("n_events", "sum"), ("sum_value_cents", "sum"),
            ("max_value_cents", "max"),
        ])
        part = pa.table({
            **{k: g[k] for k in group_by},
            "n_events": pc.cast(g["n_events_sum"], pa.int64()),
            "sum_value_cents": pc.cast(g["sum_value_cents_sum"],
                                       pa.int64()),
            "max_value_cents": pc.cast(g["max_value_cents_max"],
                                       pa.int64()),
        })
        part = part.take(pc.sort_indices(
            part, sort_keys=[(k, "ascending") for k in group_by]
        ))
    import io

    buf = io.BytesIO()
    pq.write_table(part, buf)
    atomic_write_bytes(dest_path, buf.getvalue())
    atomic_write_bytes(cp_path, json.dumps(
        {"checkpoint_us": int(new_max)}
    ).encode())
    return {"rows_processed": int(n_new), "groups": part.num_rows,
            "checkpoint_us": int(new_max)}
