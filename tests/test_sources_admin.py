"""Sources (S1), admin lifecycle (S9/S10) and config cascade (S4) tests."""

import json
import os

import pyarrow as pa
import pytest


def test_json_source_normalizes_schema(tmp_path):
    from rayfts.fixtures import TRANSCRIPT_SCHEMA, generate_transcripts
    from rayfts.sources import read_transcripts_json

    t = generate_transcripts(5, seed=42)
    rows = t.to_pylist()
    path = tmp_path / "turns.jsonl"
    with open(path, "w") as f:
        for r in rows:
            r = dict(r)
            r["ts"] = int(r["ts"].timestamp() * 1_000_000)  # epoch micros
            f.write(json.dumps(r) + "\n")
    ds = read_transcripts_json(str(path))
    out = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
    assert out.num_rows == t.num_rows
    got = out.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    exp = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert got["text"].to_pylist() == exp["text"].to_pylist()
    for f_ in TRANSCRIPT_SCHEMA:
        assert f_.name in out.column_names


def test_json_source_iso_timestamps_with_and_without_fraction(tmp_path):
    """Both ISO shapes are valid interchange — '2026-01-01T00:00:00' (no
    fractional seconds) must parse, mixed in one file with fractional rows."""
    from rayfts.sources import read_transcripts_json

    rows = [
        {"conv_id": "c0", "turn_idx": 0, "role": "user", "text": "hi",
         "tool": None, "ts": "2026-01-01T00:00:00"},
        {"conv_id": "c0", "turn_idx": 1, "role": "assistant", "text": "yo",
         "tool": None, "ts": "2026-01-01T00:00:01.250000"},
    ]
    path = tmp_path / "iso.jsonl"
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    out = pa.Table.from_pandas(
        read_transcripts_json(str(path)).to_pandas(), preserve_index=False
    ).sort_by([("turn_idx", "ascending")])
    ts = out["ts"].to_pylist()
    assert ts[0].isoformat() == "2026-01-01T00:00:00"
    assert ts[1].isoformat() == "2026-01-01T00:00:01.250000"


def test_json_source_missing_column_raises(tmp_path):
    from rayfts.sources import read_transcripts_json

    path = tmp_path / "bad.jsonl"
    with open(path, "w") as f:
        f.write(json.dumps({"conv_id": "c", "ts": 0}) + "\n")
    with pytest.raises(Exception, match="missing column"):
        read_transcripts_json(str(path)).take_all()


def test_admin_lifecycle(tmp_path):
    from rayfts.admin import create_index_dir, delete_index, index_exists, refresh
    from rayfts.build import build_index
    from rayfts.config import IndexJobConfig
    from rayfts.fixtures import write_transcripts
    from rayfts.search import Searcher

    corpus = str(tmp_path / "c")
    idx = str(tmp_path / "i")
    write_transcripts(corpus, n_convs=5, seed=42)
    assert not index_exists(idx)
    build_index(corpus, cfg=IndexJobConfig(index_dir=idx, term_buckets=4))
    assert index_exists(idx)
    m = refresh(idx)
    assert m["n_docs"] > 0
    # drop-and-recreate (ref IndexAdminService.java:22)
    create_index_dir(idx, drop_existing=True)
    assert not index_exists(idx)  # manifest gone -> not published
    with pytest.raises(FileNotFoundError):
        Searcher(idx)
    assert delete_index(idx) is True
    assert delete_index(idx) is False


def test_config_cascade(tmp_path):
    """defaults -> file -> explicit overrides (ref precedence,
    ElasticSearchWriterFactory.java:46-73)."""
    from rayfts.config import IndexJobConfig

    cfg_file = tmp_path / "cfg.json"
    cfg_file.write_text(json.dumps({"k1": 1.5, "term_buckets": 7, "junk": 1}))
    c = IndexJobConfig.from_file(str(cfg_file), term_buckets=9)
    assert c.k1 == 1.5           # from file
    assert c.term_buckets == 9   # explicit override wins
    assert c.b == 0.75           # default preserved
    c2 = c.replace(b=0.5)
    assert c2.b == 0.5 and c.b == 0.75
