"""Segment compaction must be EXACTLY a fresh build over the live union.

Pins the forceMerge(1)/expungeDeletes analog (ref: ES merges the bulk-load
segments behind service/IndexAdminService.java's refresh): compacting N
segments — with or without tombstones — produces bucket files BYTE-
identical to ``build_index`` over the concatenated live rows, so every
search path (TAAT/MaxScore/WAND/phrase/shared) is trivially identical too.
"""

import filecmp
import os

import pyarrow.compute as pc
import pytest

import ray.data as rd

from rayfts.build import build_index
from rayfts.compact import compact_index, compact_segments
from rayfts.config import IndexJobConfig
from rayfts.fixtures import REFERENCE_QUERIES, generate_transcripts
from rayfts.manifest import load_manifest
from rayfts.search import Searcher


def _sorted(t):
    return t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def _assert_bucket_files_identical(dir_a: str, dir_b: str):
    pa_dir = os.path.join(dir_a, "postings")
    pb_dir = os.path.join(dir_b, "postings")
    files = sorted(os.listdir(pa_dir))
    assert files == sorted(os.listdir(pb_dir))
    for f in files:
        assert filecmp.cmp(
            os.path.join(pa_dir, f), os.path.join(pb_dir, f), shallow=False
        ), f


def _assert_stats_equal(dir_a: str, dir_b: str):
    ma, mb = load_manifest(dir_a), load_manifest(dir_b)
    for k in ("n_docs", "total_dl", "avgdl", "n_terms", "postings_bytes"):
        assert ma[k] == mb[k], k


def test_compact_segments_equals_fresh_build(tmp_path_factory):
    root = tmp_path_factory.mktemp("cseg")
    t = _sorted(generate_transcripts(40, seed=42))
    n = t.num_rows
    parts = [t.slice(0, n // 3), t.slice(n // 3, n // 3), t.slice(2 * n // 3)]
    cfg = IndexJobConfig(term_buckets=4)
    seg_dirs = []
    for i, p in enumerate(parts):
        d = str(root / f"seg-{i}")
        build_index(rd.from_arrow(p), cfg=cfg.replace(index_dir=d))
        seg_dirs.append(d)
    fresh = str(root / "fresh")
    build_index(rd.from_arrow(t), cfg=cfg.replace(index_dir=fresh))
    out = str(root / "compacted")
    man = compact_segments(seg_dirs, out, rows_per_part=300)
    assert man["n_docs"] == n and man["purged_tombstones"] == 0
    _assert_bucket_files_identical(fresh, out)
    _assert_stats_equal(fresh, out)
    sa, sb = Searcher(fresh), Searcher(out)
    for q in REFERENCE_QUERIES:
        assert sa.search(q, k=20) == sb.search(q, k=20), q
    # docstore round-trips in the renumbered dense id space
    ids = [0, n // 2, n - 1]
    assert (
        sb.get_by_doc_id(ids)["text"].to_pylist()
        == sa.get_by_doc_id(ids)["text"].to_pylist()
    )


def test_compact_purges_tombstones(tmp_path_factory):
    """compact_index == fresh build over the live subset, byte for byte;
    the output carries no tombstones file."""
    from rayfts.admin import exclude_docs, excluded_docs

    root = tmp_path_factory.mktemp("ctomb")
    t = _sorted(generate_transcripts(30, seed=7))
    cfg = IndexJobConfig(term_buckets=4)
    src = str(root / "src")
    build_index(rd.from_arrow(t), cfg=cfg.replace(index_dir=src))
    victims = [0, 5, 6, t.num_rows - 1, t.num_rows // 2]
    exclude_docs(src, victims)

    live = t.take([i for i in range(t.num_rows) if i not in set(victims)])
    fresh = str(root / "fresh")
    build_index(rd.from_arrow(live), cfg=cfg.replace(index_dir=fresh))

    out = str(root / "compacted")
    man = compact_index(src, out, rows_per_part=250)
    assert man["purged_tombstones"] == len(victims)
    assert man["n_docs"] == t.num_rows - len(victims)
    assert excluded_docs(out) == []
    _assert_bucket_files_identical(fresh, out)
    _assert_stats_equal(fresh, out)
    sa, sb = Searcher(fresh), Searcher(out)
    for q in REFERENCE_QUERIES + ["the a to ok"]:
        assert sa.search(q, k=20) == sb.search(q, k=20), q


def test_compact_positions_and_multiseg_tombstones(tmp_path_factory):
    """Positions survive compaction across segments with tombstones in
    EACH segment: phrase search over the compacted index == fresh build
    over the live union."""
    from rayfts.admin import exclude_docs

    root = tmp_path_factory.mktemp("cpos")
    t = _sorted(generate_transcripts(30, seed=3))
    n = t.num_rows
    half = n // 2
    cfg = IndexJobConfig(term_buckets=4, index_positions=True)
    seg_dirs = []
    for i, p in enumerate([t.slice(0, half), t.slice(half)]):
        d = str(root / f"seg-{i}")
        build_index(rd.from_arrow(p), cfg=cfg.replace(index_dir=d))
        seg_dirs.append(d)
    # local-id tombstones per segment
    exclude_docs(seg_dirs[0], [1, half - 1])
    exclude_docs(seg_dirs[1], [0, 7])
    dead_global = {1, half - 1, half + 0, half + 7}
    live = t.take([i for i in range(n) if i not in dead_global])
    fresh = str(root / "fresh")
    build_index(rd.from_arrow(live), cfg=cfg.replace(index_dir=fresh))

    out = str(root / "compacted")
    man = compact_segments(seg_dirs, out, rows_per_part=200)
    assert man["positions"] and man["purged_tombstones"] == 4
    _assert_bucket_files_identical(fresh, out)
    sa, sb = Searcher(fresh), Searcher(out)
    for q in REFERENCE_QUERIES:
        assert sa.search(q, k=20) == sb.search(q, k=20), q
    for phrase in ["of the", "the same", "w0007 the"]:
        assert sa.search_phrase(phrase, k=10) == sb.search_phrase(phrase, k=10)


def test_compact_extra_tombstones_delete_by_query(tmp_path_factory):
    """extra_tombstones == ES delete_by_query + _forcemerge: the extra
    victims are purged alongside persisted tombstones, the output is
    byte-identical to a fresh build over the surviving rows, and the
    INPUT segment is left unmutated (no tombstones written back)."""
    from rayfts.admin import exclude_docs, excluded_docs

    root = tmp_path_factory.mktemp("cdbq")
    t = _sorted(generate_transcripts(30, seed=13))
    n = t.num_rows
    cfg = IndexJobConfig(term_buckets=4)
    src = str(root / "src")
    build_index(rd.from_arrow(t), cfg=cfg.replace(index_dir=src))
    persisted = [2, 9]
    exclude_docs(src, persisted)
    extra = [0, 9, n - 1, n // 3]  # 9 overlaps persisted — must dedup

    dead = set(persisted) | set(extra)
    live = t.take([i for i in range(n) if i not in dead])
    fresh = str(root / "fresh")
    build_index(rd.from_arrow(live), cfg=cfg.replace(index_dir=fresh))

    out = str(root / "compacted")
    man = compact_segments(
        [src], out, rows_per_part=250, extra_tombstones=[extra]
    )
    assert man["n_docs"] == n - len(dead)
    assert man["purged_tombstones"] == len(dead)
    _assert_bucket_files_identical(fresh, out)
    _assert_stats_equal(fresh, out)
    # input segment untouched: only the originally persisted tombstones
    assert excluded_docs(src) == sorted(persisted)
    sa, sb = Searcher(fresh), Searcher(out)
    for q in REFERENCE_QUERIES:
        assert sa.search(q, k=20) == sb.search(q, k=20), q
    with pytest.raises(ValueError, match="one entry per segment"):
        compact_segments([src], str(root / "bad"), extra_tombstones=[[], []])


def test_compact_resume_rebuilds_only_missing_units(tmp_path_factory):
    root = tmp_path_factory.mktemp("cres")
    t = _sorted(generate_transcripts(20, seed=11))
    cfg = IndexJobConfig(term_buckets=4)
    src = str(root / "src")
    build_index(rd.from_arrow(t), cfg=cfg.replace(index_dir=src))
    out = str(root / "compacted")
    compact_index(src, out, rows_per_part=60)
    import pyarrow.parquet as pq

    want = {
        f: pq.read_table(os.path.join(out, "postings", f))
        for f in os.listdir(os.path.join(out, "postings"))
    }
    # crash shape: one bucket file and one docstore partition lost
    os.remove(os.path.join(out, "postings", "bucket-0002.parquet"))
    parts = sorted(os.listdir(os.path.join(out, "docstore")))
    assert len(parts) > 1  # rows_per_part must split this corpus
    os.remove(os.path.join(out, "docstore", parts[-1]))
    os.remove(os.path.join(out, "manifest.json"))
    man = compact_index(src, out, rows_per_part=60, resume=True)
    assert man["n_docs"] == t.num_rows
    for f, tbl in want.items():
        assert pq.read_table(os.path.join(out, "postings", f)).equals(tbl), f
    s = Searcher(out)
    assert s.search(REFERENCE_QUERIES[0], k=10)


def test_compact_config_mismatch_raises(tmp_path_factory):
    root = tmp_path_factory.mktemp("cbad")
    t = _sorted(generate_transcripts(10, seed=5))
    a, b = str(root / "a"), str(root / "b")
    half = t.num_rows // 2
    build_index(
        rd.from_arrow(t.slice(0, half)),
        cfg=IndexJobConfig(index_dir=a, term_buckets=4),
    )
    build_index(
        rd.from_arrow(t.slice(half)),
        cfg=IndexJobConfig(index_dir=b, term_buckets=8),
    )
    with pytest.raises(ValueError, match="term_buckets"):
        compact_segments([a, b], str(root / "out"))
