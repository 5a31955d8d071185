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


# ---------------------------------------------------------------------------
# doc-exclusion tombstones — the per-doc delete analog
# ---------------------------------------------------------------------------

TOMBSTONES_NAME = "tombstones.json"


def exclude_docs(index_dir: str, doc_ids) -> list[int]:
    """Tombstone doc ids: the analog of the reference's per-doc delete
    (dao/EntityDao.java:269-280 delete(Class,long);
    service/IndexAdminService.java:72-78 deleteDocument) for an immutable
    batch index — the Lucene deleted-docs-bitset pattern. Excluded docs
    never appear in top-k, multiget raises for them, and count() skips
    them. Visible to Searchers constructed AFTER the write (the refresh
    semantic); postings/docstore files are untouched, so a tombstone is
    cheap and reversible (clear_exclusions). Typical use: post-hoc
    contamination removal from a training corpus."""
    import json

    from .manifest import _atomic_write_json

    current = set(excluded_docs(index_dir))
    current.update(int(d) for d in doc_ids)
    out = sorted(current)
    _atomic_write_json(
        os.path.join(index_dir, TOMBSTONES_NAME), {"excluded": out}
    )
    return out


def delete_by_query(index_dir: str, query: str | None,
                    where: dict | None = None, mode: str = "or",
                    must_not: str | None = None) -> dict:
    """ES _delete_by_query analog: tombstone every LIVE doc matching the
    query (the same query/filter surface search exposes — ``query=None``
    is match_all, so ``where``-only deletes work like ES's filter-context
    bool). Built on the exclude_docs tombstone path (the Lucene
    deleted-docs-bitset pattern), so it is cheap, reversible
    (clear_exclusions) and physically purged by the forceMerge analog
    (compact.compact_segments — ES's own delete_by_query + _forcemerge
    composition). Returns {"deleted": n, "excluded_total": m} — deleted
    counts only newly-tombstoned docs, the ES response shape."""
    import numpy as np

    from .search import Searcher

    s = Searcher(index_dir)
    hits = s._hit_mask(query, where, mode, must_not)
    ids = [] if hits is None else np.flatnonzero(hits).tolist()
    before = set(excluded_docs(index_dir))
    out = exclude_docs(index_dir, ids)
    return {
        "deleted": len(set(int(i) for i in ids) - before),
        "excluded_total": len(out),
    }


def clear_exclusions(index_dir: str) -> None:
    p = os.path.join(index_dir, TOMBSTONES_NAME)
    if os.path.exists(p):
        os.remove(p)


def excluded_docs(index_dir: str) -> list[int]:
    import json

    p = os.path.join(index_dir, TOMBSTONES_NAME)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return [int(d) for d in json.load(f).get("excluded", [])]


def snapshot(index_dir: str, snapshot_dir: str) -> dict:
    """ES _snapshot analog: copy a PUBLISHED index to ``snapshot_dir``
    with the manifest written LAST (temp-free: the copy is only readable
    once its manifest lands, the same publish gate every reader trusts).
    Tombstones travel with the snapshot (point-in-time state). Returns
    the snapshot's manifest."""
    if not index_exists(index_dir):
        raise FileNotFoundError(f"not a published index: {index_dir}")
    if os.path.exists(snapshot_dir) and (
        not os.path.isdir(snapshot_dir) or os.listdir(snapshot_dir)
    ):
        raise FileExistsError(f"snapshot target not empty: {snapshot_dir}")
    # manifest AND tombstones read FIRST: the copied bytes and the
    # published manifest are the same generation even if a writer
    # republishes mid-copy (the copy may include newer files, but the
    # manifest only names state it saw — readers trust the manifest).
    # Tombstones are mutated in place (not manifest-gated), so a delete
    # racing the file walk could otherwise land tombstones NEWER than
    # the captured manifest generation; capturing them up front keeps
    # the point-in-time claim honest under concurrent writers.
    m = load_manifest(index_dir)
    excluded_at_capture = excluded_docs(index_dir)
    os.makedirs(snapshot_dir, exist_ok=True)
    manifest_src = os.path.join(index_dir, MANIFEST_NAME)
    tombstones_src = os.path.join(index_dir, TOMBSTONES_NAME)
    for root, _, files in os.walk(index_dir):
        rel = os.path.relpath(root, index_dir)
        dst_root = os.path.join(snapshot_dir, rel) if rel != "." else snapshot_dir
        os.makedirs(dst_root, exist_ok=True)
        for f in files:
            src = os.path.join(root, f)
            if src in (manifest_src, tombstones_src):
                continue  # manifest publishes last; tombstones = capture
            shutil.copy2(src, os.path.join(dst_root, f))
    if excluded_at_capture:
        from .manifest import _atomic_write_json

        _atomic_write_json(
            os.path.join(snapshot_dir, TOMBSTONES_NAME),
            {"excluded": excluded_at_capture},
        )
    publish_manifest(snapshot_dir, m)
    return m


def restore(snapshot_dir: str, index_dir: str) -> dict:
    """ES _restore analog: materialize a snapshot as a fresh index
    (drop-if-exists, like createIndex — IndexAdminService.java:22)."""
    if not index_exists(snapshot_dir):
        raise FileNotFoundError(f"not a published snapshot: {snapshot_dir}")
    delete_index(index_dir)
    return snapshot(snapshot_dir, index_dir)


def rollover(registry_dir: str, alias: str, new_index_dir: str,
             max_docs: int) -> bool:
    """ES rollover-API analog over the alias registry: when the alias's
    NEWEST target has reached ``max_docs``, append ``new_index_dir`` (a
    published index over the next key range) as the new write target —
    the alias keeps EVERY generation, so opening it searches all of them
    as a MultiSearcher (targets must be disjoint ascending key-range
    segments, which sequential rollover produces naturally). Returns
    True when rolled, False when the current target is still under the
    threshold."""
    dirs = resolve_alias(registry_dir, alias)
    if new_index_dir in dirs:
        return False  # idempotent: a retried rollover never duplicates
    newest = load_manifest(dirs[-1])
    # live docs, like ES max_docs (deletes don't count toward the gate)
    live = newest["n_docs"] - len(excluded_docs(dirs[-1]))
    if live < max_docs:
        return False
    if not index_exists(new_index_dir):
        raise FileNotFoundError(
            f"rollover target is not a published index: {new_index_dir}"
        )
    set_alias(registry_dir, alias, dirs + [new_index_dir])
    return True


def reindex(src_index_dir: str, index_dir: str, where: dict | None = None,
            rows_per_part: int = 250_000, **cfg_overrides) -> dict:
    """ES _reindex analog: build a NEW index from an existing index's
    docstore — the original source is not needed. The new config starts
    from the SOURCE manifest (key_cols, text_col, k1/b, term_buckets,
    positions, stopwords); pass overrides to change the mapping (the ES
    migrate-to-new-analyzer/mapping use, e.g. ``stopwords=(...)`` or
    ``index_positions=True``). ``where`` is reindex-with-query (the same
    filter surface as filter_mask, pushed down into the parquet read);
    tombstoned docs DROP — deletes don't survive a reindex, exactly ES.
    Streaming: docstore parquet -> filter -> the standard build
    pipeline; nothing materializes on the driver. Returns the new
    manifest."""
    import pyarrow.compute as pc
    import ray.data as rd

    from .build import build_index
    from .config import IndexJobConfig
    from .search import _where_expr

    m = load_manifest(src_index_dir)
    base = dict(
        index_dir=index_dir,
        key_cols=tuple(m["key_cols"]),
        text_col=m["text_col"],
        k1=m["k1"],
        b=m["b"],
        term_buckets=m["term_buckets"],
        index_positions=bool(m.get("positions", False)),
        stopwords=tuple(m.get("stopwords", ())),
    )
    base.update(cfg_overrides)
    cfg = IndexJobConfig(**base)
    expr = _where_expr(where) if where else None
    excl = excluded_docs(src_index_dir)
    if excl:
        live = ~pc.field("doc_id").isin(excl)
        expr = live if expr is None else expr & live
    docstore = os.path.join(src_index_dir, "docstore")
    ds = rd.read_parquet(docstore, **({"filter": expr} if expr is not None else {}))
    # the new build re-derives dense doc_ids from key_cols
    ds = ds.map_batches(
        lambda t: t.drop_columns(["doc_id"]), batch_format="pyarrow"
    )
    return build_index(ds, cfg=cfg, rows_per_part=rows_per_part)


def update_by_query(src_index_dir: str, index_dir: str,
                    query: str | None, processors: list[dict],
                    where: dict | None = None, mode: str = "or",
                    must_not: str | None = None,
                    rows_per_part: int = 250_000,
                    **cfg_overrides) -> dict:
    """ES _update_by_query analog: apply an ingest-processor chain to
    every LIVE doc matching the query and republish — ES itself
    snapshots and reindexes each hit in place; an immutable batch index
    republishes as a NEW index at ``index_dir`` (the reindex path),
    which is also what makes the operation safely restartable at scale.
    Non-matching docs pass through untouched; tombstoned docs DROP
    (deletes don't survive a reindex, exactly ES). The processor chain
    must PRESERVE the docstore schema (ES scripts mutate fields; a
    rename/remove would leave matched and unmatched rows with different
    shapes) — violations raise, never approximate. Per batch the chain
    runs once vectorized and a doc-id mask ``if_else`` keeps the
    untouched rows, so the whole update is streaming Arrow kernels; the
    hit mask ships once via ``ray.put`` (object-store broadcast, one
    copy per node). Returns {"updated": n, "manifest": <new manifest>}."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from .build import build_index
    from .config import IndexJobConfig
    from .ingest import IngestPipeline, UnsupportedProcessor
    from .search import Searcher

    pipe = IngestPipeline(processors)
    s = Searcher(src_index_dir)
    # fail fast, driver-side: the chain must preserve the docstore
    # schema (run it on an empty schema-shaped table — cheap and exact)
    import pyarrow.dataset as pads

    ds_schema = pads.dataset(
        os.path.join(src_index_dir, "docstore")
    ).schema
    probe = ds_schema.empty_table()
    if pipe.transform_batch(probe).schema.names != probe.schema.names:
        # names-only here (an empty probe can't type-check a `set`
        # value); the per-batch full-schema check is the exact net
        raise UnsupportedProcessor(
            "update_by_query processors must preserve the docstore "
            "schema (ES scripts mutate fields in place; rename/remove/"
            "new-field chains would leave matched and unmatched rows "
            "with different shapes)"
        )
    hits = s._hit_mask(query, where, mode, must_not)
    if hits is None:
        hits = np.zeros(s.N, dtype=bool)
    n_updated = int(hits.sum())
    mask_ref = ray.put(hits)

    m = load_manifest(src_index_dir)
    base = dict(
        index_dir=index_dir,
        key_cols=tuple(m["key_cols"]),
        text_col=m["text_col"],
        k1=m["k1"],
        b=m["b"],
        term_buckets=m["term_buckets"],
        index_positions=bool(m.get("positions", False)),
        stopwords=tuple(m.get("stopwords", ())),
    )
    base.update(cfg_overrides)
    cfg = IndexJobConfig(**base)
    excl = excluded_docs(src_index_dir)
    expr = ~pc.field("doc_id").isin(excl) if excl else None
    docstore = os.path.join(src_index_dir, "docstore")
    ds = rd.read_parquet(
        docstore, **({"filter": expr} if expr is not None else {})
    )

    def upd(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        mask = ray.get(mask_ref)
        sel = mask[t["doc_id"].to_numpy(zero_copy_only=False)]
        if not sel.any():
            return t.drop_columns(["doc_id"])
        tr = pipe.transform_batch(t).combine_chunks()
        if tr.schema != t.schema:
            raise UnsupportedProcessor(
                "update_by_query processors must preserve the docstore "
                f"schema; got {tr.schema.names} vs {t.schema.names}"
            )
        touched = {
            b.get("field") for p in processors for b in p.values()
        } | {
            b.get("target_field") for p in processors for b in p.values()
        }
        selm = pa.array(sel)
        out = pa.table({
            c: pc.if_else(selm, tr[c], t[c]) if c in touched else t[c]
            for c in t.column_names
        })
        return out.drop_columns(["doc_id"])

    ds = ds.map_batches(upd, batch_format="pyarrow")
    man = build_index(ds, cfg=cfg, rows_per_part=rows_per_part)
    return {"updated": n_updated, "manifest": man}


# ---------------------------------------------------------------------------
# index aliases — the ES alias API analog
# ---------------------------------------------------------------------------

ALIASES_NAME = "aliases.json"


def _aliases_path(registry_dir: str) -> str:
    return os.path.join(registry_dir, ALIASES_NAME)


def list_aliases(registry_dir: str) -> dict[str, list[str]]:
    """alias -> [index_dir, ...] from the registry (empty if none)."""
    import json

    p = _aliases_path(registry_dir)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return {a: list(dirs) for a, dirs in json.load(f).items()}


def set_alias(registry_dir: str, alias: str, index_dirs) -> dict:
    """ES alias-API analog (POST _aliases add): point ``alias`` at one or
    more PUBLISHED indexes, atomically replacing any previous targets —
    the atomic-swap pattern a batch rebuild needs (build the new index,
    repoint the alias, readers never see a half state; the reference's
    single `index.name` property is this without the indirection,
    plugin.properties:6). Every target must be published
    (fail-don't-swallow, like the S7 bulk-write rule)."""
    from .manifest import _atomic_write_json

    dirs = [str(d) for d in (
        [index_dirs] if isinstance(index_dirs, (str, os.PathLike))
        else index_dirs
    )]
    if not dirs:
        raise ValueError("alias needs at least one index dir")
    for d in dirs:
        if not index_exists(d):
            raise FileNotFoundError(f"alias target is not a published index: {d}")
    os.makedirs(registry_dir, exist_ok=True)
    aliases = list_aliases(registry_dir)
    aliases[alias] = dirs
    _atomic_write_json(_aliases_path(registry_dir), aliases)
    return aliases


def delete_alias(registry_dir: str, alias: str) -> bool:
    """Remove an alias (the indexes it points at are untouched)."""
    from .manifest import _atomic_write_json

    aliases = list_aliases(registry_dir)
    if alias not in aliases:
        return False
    del aliases[alias]
    _atomic_write_json(_aliases_path(registry_dir), aliases)
    return True


def resolve_alias(registry_dir: str, alias: str) -> list[str]:
    aliases = list_aliases(registry_dir)
    if alias not in aliases:
        raise KeyError(f"unknown alias {alias!r}")
    return aliases[alias]


def open_alias(registry_dir: str, alias: str):
    """Open a reader through an alias: one target -> Searcher, several ->
    MultiSearcher over them in registry order (the ES search-an-alias
    behavior for multi-index aliases; targets must be disjoint dense
    doc-range segments in order, as MultiSearcher requires)."""
    from .search import MultiSearcher, Searcher

    dirs = resolve_alias(registry_dir, alias)
    return Searcher(dirs[0]) if len(dirs) == 1 else MultiSearcher(dirs)


_ES_TYPE = {
    "int64": "long", "int32": "integer", "double": "double",
    "float": "float", "string": "keyword", "large_string": "keyword",
    "bool": "boolean",
}


def get_mapping(index_dir: str) -> dict:
    """ES ``GET /index/_mapping`` analog, derived from the published
    state: the docstore parquet schema maps to ES field types (int64 ->
    long, string -> keyword, timestamp -> date, map -> flattened), the
    manifest's analyzed ``text_col`` overrides to type "text" with the
    index-analyzer knobs attached, and ``positions`` reports as the
    text field's index_options (the Lucene positions/freqs split)."""
    import pyarrow.dataset as pads

    m = load_manifest(index_dir)
    schema = pads.dataset(os.path.join(index_dir, "docstore")).schema
    props: dict = {}
    for f in schema:
        t = str(f.type)
        if f.name == m.get("text_col", "text"):
            props[f.name] = {
                "type": "text",
                "index_options": ("positions" if m.get("positions")
                                 else "freqs"),
                "analyzer": "rayfts_standard",
            }
        elif t.startswith("timestamp"):
            props[f.name] = {"type": "date"}
        elif t.startswith("map") or t.startswith("struct"):
            props[f.name] = {"type": "flattened"}
        else:
            props[f.name] = {"type": _ES_TYPE.get(t, t)}
    return {"mappings": {"properties": props}}


def get_settings(index_dir: str) -> dict:
    """ES ``GET /index/_settings`` analog: the manifest's knobs in an
    ES-shaped settings dict — the BM25 similarity pair, the analyzer
    chain config (stopwords / stemmer / shingles / prefixes), and the
    storage layout facts (term_buckets — the shard-count analog —
    plus format_version and doc counts as read-only stats)."""
    m = load_manifest(index_dir)
    return {
        "settings": {
            "index": {
                "number_of_buckets": m["term_buckets"],
                "format_version": m["format_version"],
                "similarity": {
                    "default": {"type": "BM25",
                                "k1": m["k1"], "b": m["b"]},
                },
                "analysis": {
                    "stopwords": sorted(m.get("stopwords", []) or []),
                    "stemmer": m.get("stemmer", ""),
                    "shingle_size": m.get("shingle_size", 0),
                    "index_prefixes": list(
                        m.get("index_prefixes", []) or []
                    ),
                    "positions": bool(m.get("positions")),
                },
            },
        },
        "stats": {"n_docs": m["n_docs"], "n_terms": m["n_terms"],
                  "postings_bytes": m["postings_bytes"]},
    }


def disk_usage(index_dir: str) -> dict:
    """ES ``_disk_usage`` API analog: on-disk footprint of a published
    index, broken down two ways —

    * per COMPONENT (the storage-role analog of ES's per-index
      breakdown): ``docstore`` / ``postings`` / ``norms`` /
      ``manifest`` / ``checkpoints`` / ``tombstones`` / ``other``,
      each {files, bytes};
    * per docstore FIELD (the ES per-field breakdown): compressed
      column-chunk bytes summed from the parquet footers — the true
      storage cost of each stored field, no data read.

    Pure footer/stat walk: O(files) metadata reads, never row data.
    """
    comps: dict[str, dict] = {}
    total = 0
    for root, _dirs, files in os.walk(index_dir):
        rel = os.path.relpath(root, index_dir)
        top = rel.split(os.sep)[0] if rel != "." else ""
        for fn in files:
            sz = os.path.getsize(os.path.join(root, fn))
            comp = {
                "docstore": "docstore", "postings": "postings",
                "norms": "norms", "_checkpoints": "checkpoints",
            }.get(top)
            if comp is None:
                comp = ("manifest" if fn == MANIFEST_NAME
                        else "tombstones" if fn == "tombstones.json"
                        else "other")
            c = comps.setdefault(comp, {"files": 0, "bytes": 0})
            c["files"] += 1
            c["bytes"] += sz
            total += sz
    fields: dict[str, int] = {}
    doc_dir = os.path.join(index_dir, "docstore")
    if os.path.isdir(doc_dir):
        import pyarrow.parquet as pq

        for fn in sorted(os.listdir(doc_dir)):
            if not fn.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(doc_dir, fn))
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    name = col.path_in_schema.split(".")[0]
                    fields[name] = (fields.get(name, 0) +
                                    col.total_compressed_size)
    return {
        "total_bytes": total,
        "components": comps,
        "docstore_fields": fields,
    }
