"""Checkpoint/resume tests (FIXTURES.md §4; north_rule resumability).

The reference cannot resume (drop-and-recreate at IndexAdminService.java:22);
this engine must: kill after partition k, rerun with resume=True, only the
missing unit is rebuilt and the published index is identical.
"""

import json
import os

import pyarrow.parquet as pq
import pytest

from rayfts.build import build_index
from rayfts.config import IndexJobConfig
from rayfts.fixtures import REFERENCE_QUERIES, write_transcripts
from rayfts.search import Searcher


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus_r")
    write_transcripts(str(d), n_convs=30, seed=42)
    return str(d)


def _docstore_content(index_dir):
    return (
        pq.read_table(os.path.join(index_dir, "docstore"))
        .sort_by([("doc_id", "ascending")])
        .to_pydict()
    )


def test_resume_rebuilds_only_missing_partition(corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index_r"))
    cfg = IndexJobConfig(index_dir=d, term_buckets=4)
    m1 = build_index(corpus, cfg=cfg, rows_per_part=50)
    parts = m1["docstore"]["partitions"]
    assert len(parts) >= 3
    baseline = _docstore_content(d)
    search1 = Searcher(d).search("the w0007", k=10)

    # simulate a crash that lost partition 1 (data + checkpoint + stage marker)
    victim = parts[1]
    os.remove(os.path.join(d, victim["file"]))
    os.remove(os.path.join(d, "_checkpoints", "docstore", "part-000001.json"))
    for stage_unit in ("docstore", "postings"):
        p = os.path.join(d, "_checkpoints", "stage", f"{stage_unit}.json")
        if os.path.exists(p):
            os.remove(p)
    os.remove(os.path.join(d, "manifest.json"))

    # record mtimes of surviving partitions to prove they are skipped
    surviving = [p["file"] for i, p in enumerate(parts) if i != 1]
    mtimes = {f: os.path.getmtime(os.path.join(d, f)) for f in surviving}

    m2 = build_index(corpus, cfg=cfg.replace(resume=True), rows_per_part=50)
    for f in surviving:
        assert os.path.getmtime(os.path.join(d, f)) == mtimes[f], f"{f} rewritten"

    assert _docstore_content(d) == baseline
    rebuilt = json.load(
        open(os.path.join(d, "_checkpoints", "docstore", "part-000001.json"))
    )
    assert rebuilt["checksum"] == victim["checksum"]  # byte-identical partition
    assert m2["n_docs"] == m1["n_docs"]
    assert m2["n_terms"] == m1["n_terms"]
    assert m2["avgdl"] == m1["avgdl"]
    assert Searcher(d).search("the w0007", k=10) == search1


def test_resume_skips_everything_when_complete(corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index_r2"))
    cfg = IndexJobConfig(index_dir=d, term_buckets=4)
    m1 = build_index(corpus, cfg=cfg, rows_per_part=50)
    files = {
        p["file"]: os.path.getmtime(os.path.join(d, p["file"]))
        for p in m1["docstore"]["partitions"]
    }
    m2 = build_index(corpus, cfg=cfg.replace(resume=True), rows_per_part=50)
    for f, t in files.items():
        assert os.path.getmtime(os.path.join(d, f)) == t
    assert m2["n_docs"] == m1["n_docs"]


def test_overwrite_drops_existing(corpus, tmp_path_factory):
    """ref semantics: createIndex drops any existing index
    (IndexAdminService.java:22)."""
    d = str(tmp_path_factory.mktemp("index_r3"))
    cfg = IndexJobConfig(index_dir=d, term_buckets=4)
    build_index(corpus, cfg=cfg, rows_per_part=50)
    marker = os.path.join(d, "stale_file")
    open(marker, "w").close()
    build_index(corpus, cfg=cfg, rows_per_part=50)
    assert not os.path.exists(marker)
    for q in REFERENCE_QUERIES:
        Searcher(d).search(q, k=5)  # index healthy after rebuild


def test_resume_docstore_partition_and_bucket_both_missing(corpus, tmp_path_factory):
    """The state a mid-build crash leaves (docstore writes overlap the
    postings stage): one docstore partition AND one postings bucket missing
    together. The analyze rerun must cover the REBUILT partition too (its
    table ref, not doc_info['partitions'], which only lists checkpointed
    ones) or the build aborts with norms rows != docstore rows."""
    d = str(tmp_path_factory.mktemp("index_rb"))
    cfg = IndexJobConfig(index_dir=d, term_buckets=4)
    m1 = build_index(corpus, cfg=cfg, rows_per_part=50)
    search1 = Searcher(d).search("the w0007", k=10)
    baseline = _docstore_content(d)

    # crash state: docstore partition 1 and postings bucket 2 both lost
    victim_part = m1["docstore"]["partitions"][1]
    os.remove(os.path.join(d, victim_part["file"]))
    os.remove(os.path.join(d, "_checkpoints", "docstore", "part-000001.json"))
    os.remove(os.path.join(d, "postings", "bucket-0002.parquet"))
    os.remove(os.path.join(d, "_checkpoints", "postings", "bucket-0002.json"))
    stage_ckpt = os.path.join(d, "_checkpoints", "stage", "docstore.json")
    if os.path.exists(stage_ckpt):
        os.remove(stage_ckpt)
    os.remove(os.path.join(d, "manifest.json"))

    m2 = build_index(corpus, cfg=cfg.replace(resume=True), rows_per_part=50)
    assert m2["n_docs"] == m1["n_docs"]
    assert m2["n_terms"] == m1["n_terms"]
    assert m2["avgdl"] == m1["avgdl"]
    assert _docstore_content(d) == baseline
    assert Searcher(d).search("the w0007", k=10) == search1


def test_resume_rebuilds_only_missing_bucket(corpus, tmp_path_factory):
    """Per-bucket postings checkpoints: losing one bucket file reruns only
    that bucket's merge (the others' files are untouched)."""
    import pyarrow.parquet as pq2

    d = str(tmp_path_factory.mktemp("index_b"))
    cfg = IndexJobConfig(index_dir=d, term_buckets=4)
    m1 = build_index(corpus, cfg=cfg, rows_per_part=50)
    victim = os.path.join(d, "postings", "bucket-0002.parquet")
    before = pq2.read_table(victim)
    keep_file = os.path.join(d, "postings", "bucket-0001.parquet")
    os.remove(victim)
    os.remove(os.path.join(d, "_checkpoints", "postings", "bucket-0002.json"))
    os.remove(os.path.join(d, "manifest.json"))
    mtime_keep = os.path.getmtime(keep_file)

    m2 = build_index(corpus, cfg=cfg.replace(resume=True), rows_per_part=50)
    assert os.path.getmtime(keep_file) == mtime_keep  # untouched bucket
    after = pq2.read_table(victim)
    assert after.sort_by([("term", "ascending")]).equals(
        before.sort_by([("term", "ascending")])
    )
    assert m2["n_terms"] == m1["n_terms"]
    assert Searcher(d).search("the w0007", k=5)


def test_resume_missing_bucket_with_salted_hot_term(corpus, tmp_path_factory):
    """Resume x salting: deleting a bucket that holds a SALTED hot term and
    resuming must re-run the salted merge pipeline for that bucket only and
    reproduce the file byte-identically."""
    import os

    from rayfts.build import build_index, term_bucket_py
    from rayfts.config import IndexJobConfig

    d = str(tmp_path_factory.mktemp("idx_salt_resume"))
    cfg = IndexJobConfig(
        index_dir=d, term_buckets=4, salt_hot_terms=("the",), hot_term_salts=3
    )
    build_index(corpus, cfg=cfg, rows_per_part=100)
    hot_bucket = term_bucket_py("the", 4)
    f = os.path.join(d, "postings", f"bucket-{hot_bucket:04d}.parquet")
    with open(f, "rb") as fh:
        want = fh.read()
    os.remove(f)
    os.remove(
        os.path.join(d, "_checkpoints", "postings", f"bucket-{hot_bucket:04d}.json")
    )
    build_index(corpus, cfg=cfg.replace(resume=True), rows_per_part=100)
    with open(f, "rb") as fh:
        got = fh.read()
    assert got == want
