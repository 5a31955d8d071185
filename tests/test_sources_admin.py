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


def test_disk_usage_breakdown(tmp_path):
    """ES _disk_usage analog: component bytes partition the os.walk
    total exactly; the per-field breakdown covers every docstore
    column with positive parquet column-chunk bytes; the text field
    dominates (it is the payload)."""
    import os

    from rayfts.admin import disk_usage
    from rayfts.build import build_index
    from rayfts.config import IndexJobConfig
    from rayfts.fixtures import write_transcripts

    corpus = str(tmp_path / "c")
    idx = str(tmp_path / "i")
    write_transcripts(corpus, n_convs=20, seed=42)
    build_index(corpus, cfg=IndexJobConfig(index_dir=idx,
                                           term_buckets=4))
    d = disk_usage(idx)
    walk = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(idx) for f in fs
    )
    assert d["total_bytes"] == walk > 0
    assert sum(c["bytes"] for c in d["components"].values()) == walk
    assert {"docstore", "postings", "norms", "manifest"} <= \
        set(d["components"])
    f = d["docstore_fields"]
    assert {"doc_id", "conv_id", "turn_idx", "role", "text"} <= set(f)
    assert all(v > 0 for v in f.values())
    assert f["text"] == max(f.values())
    # the CLI surface prints the same dict
    from rayfts.admin import disk_usage as du2
    assert du2(idx) == d  # stat walk is deterministic


def test_mapping_settings_and_simulate(tmp_path):
    """_mapping derives ES types from the docstore schema (text col ->
    analyzed text with index_options, timestamp -> date, map ->
    flattened); _settings carries the BM25 pair + analyzer knobs;
    ingest _simulate returns final docs (and per-processor states
    verbose), never touching an index."""
    from rayfts.admin import get_mapping, get_settings
    from rayfts.build import build_index
    from rayfts.config import IndexJobConfig
    from rayfts.fixtures import write_transcripts
    from rayfts.ingest import IngestPipeline

    corpus = str(tmp_path / "c")
    idx = str(tmp_path / "i")
    write_transcripts(corpus, n_convs=5, seed=42)
    build_index(corpus, cfg=IndexJobConfig(
        index_dir=idx, term_buckets=4, stopwords=("the",)))
    props = get_mapping(idx)["mappings"]["properties"]
    assert props["text"]["type"] == "text"
    assert props["text"]["index_options"] == "freqs"  # no positions
    assert props["doc_id"] == {"type": "long"}
    assert props["role"] == {"type": "keyword"}
    assert props["ts"] == {"type": "date"}
    assert props["turn_idx"] == {"type": "integer"}
    st = get_settings(idx)["settings"]["index"]
    assert st["similarity"]["default"] == {
        "type": "BM25", "k1": 1.2, "b": 0.75}
    assert st["analysis"]["stopwords"] == ["the"]
    assert st["number_of_buckets"] == 4

    pipe = IngestPipeline([
        {"lowercase": {"field": "t"}},
        {"grok": {"field": "t", "pattern": "%{WORD:w} %{GREEDYDATA:r}"}},
        {"drop": {"field": "w", "equals": "skip"}},
    ])
    docs = [{"t": "Hello World now"}, {"t": "SKIP this row"}]
    out = pipe.simulate(docs)
    assert [d["w"] for d in out] == ["hello"]  # dropped row gone
    steps = pipe.simulate(docs, verbose=True)
    assert [s["processor"] for s in steps] == ["lowercase", "grok",
                                               "drop"]
    assert steps[0]["docs"][1]["t"] == "skip this row"
    assert len(steps[1]["docs"]) == 2      # grok sees both
    assert len(steps[2]["docs"]) == 1      # drop removes one


def test_field_caps(tmp_path):
    from rayfts.build import build_index
    from rayfts.config import IndexJobConfig
    from rayfts.fixtures import write_transcripts
    from rayfts.search import Searcher

    corpus = str(tmp_path / "c")
    write_transcripts(corpus, n_convs=4, seed=42)
    d = str(tmp_path / "i")
    build_index(
        corpus,
        cfg=IndexJobConfig(index_dir=d, term_buckets=4,
                           index_positions=True),
    )
    caps = Searcher(d).field_caps()
    f = caps["fields"]
    assert f["text"]["analyzed"] and f["text"]["positions"]
    assert f["role"]["filterable"] and not f["role"]["analyzed"]
    assert f["turn_idx"]["type"].startswith("int")
    assert caps["n_docs"] > 0 and caps["n_terms"] > 0
    assert caps["stopwords"] == []


def test_snapshot_restore_and_rollover(tmp_path):
    """Snapshot copies publish-gated (manifest last), restore is
    drop-and-recreate, rollover appends a generation once the newest
    target hits max_docs — and the rolled alias searches ALL
    generations."""
    from rayfts.admin import (
        exclude_docs, index_exists, open_alias, resolve_alias, restore,
        rollover, set_alias, snapshot,
    )
    from rayfts.build import build_index
    from rayfts.config import IndexJobConfig
    from rayfts.fixtures import write_transcripts
    from rayfts.search import MultiSearcher, Searcher

    corpus = str(tmp_path / "c")
    write_transcripts(corpus, n_convs=6, seed=42)
    a = str(tmp_path / "a")
    build_index(corpus, cfg=IndexJobConfig(index_dir=a, term_buckets=4))
    s0 = Searcher(a)
    exclude_docs(a, [0])
    # snapshot carries point-in-time state (incl. tombstones)
    snap = str(tmp_path / "snap")
    snapshot(a, snap)
    with pytest.raises(FileExistsError):
        snapshot(a, snap)
    rest = str(tmp_path / "rest")
    restore(snap, rest)
    s1 = Searcher(rest)
    assert s1.N == s0.N and 0 in s1._excluded_set
    q = "the w0007"
    assert s1.search(q, k=10) == Searcher(a).search(q, k=10)
    # rollover: under threshold -> no-op; at threshold -> new generation
    reg = str(tmp_path / "reg")
    set_alias(reg, "live", a)
    b = str(tmp_path / "b")
    with pytest.raises(FileNotFoundError):
        rollover(reg, "live", b, max_docs=1)
    assert rollover(reg, "live", rest, max_docs=10**9) is False
    # the gate counts LIVE docs (tombstones excluded, ES max_docs)
    assert rollover(reg, "live", rest, max_docs=s0.N) is False
    assert rollover(reg, "live", rest, max_docs=1) is True
    assert resolve_alias(reg, "live") == [a, rest]
    # retried rollover with the same target is idempotent
    assert rollover(reg, "live", rest, max_docs=1) is False
    assert resolve_alias(reg, "live") == [a, rest]
    ms = open_alias(reg, "live")
    assert isinstance(ms, MultiSearcher) and ms.N == 2 * s0.N


def test_snapshot_tombstones_are_point_in_time(tmp_path, monkeypatch):
    """A delete racing the snapshot's file walk must NOT leak into the
    snapshot: tombstones are captured once alongside the manifest, so
    the snapshot's excluded set is exactly the capture-time set even
    when exclude_docs runs mid-copy."""
    import shutil as _sh

    from rayfts import admin as adm
    from rayfts.build import build_index
    from rayfts.config import IndexJobConfig
    from rayfts.fixtures import write_transcripts

    corpus = str(tmp_path / "c")
    write_transcripts(corpus, n_convs=6, seed=42)
    a = str(tmp_path / "a")
    build_index(corpus, cfg=IndexJobConfig(index_dir=a, term_buckets=4))
    adm.exclude_docs(a, [0])

    real_copy2 = _sh.copy2
    raced = {"done": False}

    def racing_copy2(src, dst, **kw):
        if not raced["done"]:
            raced["done"] = True
            adm.exclude_docs(a, [1])  # concurrent writer mid-walk
        return real_copy2(src, dst, **kw)

    monkeypatch.setattr("rayfts.admin.shutil.copy2", racing_copy2)
    snap = str(tmp_path / "snap")
    adm.snapshot(a, snap)
    assert raced["done"]
    assert adm.excluded_docs(snap) == [0]       # capture-time state only
    assert adm.excluded_docs(a) == [0, 1]       # source moved on


def test_multisearcher_rejects_mismatched_analyzer_config(tmp_path):
    """Segments built with different stop lists (or k1/b) silently
    mis-analyze queries — MultiSearcher must refuse to open them."""
    from rayfts.build import build_index
    from rayfts.config import IndexJobConfig
    from rayfts.fixtures import write_transcripts
    from rayfts.search import MultiSearcher

    corpus = str(tmp_path / "c")
    write_transcripts(corpus, n_convs=4, seed=42)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(corpus, cfg=IndexJobConfig(index_dir=a, term_buckets=4))
    build_index(corpus, cfg=IndexJobConfig(
        index_dir=b, term_buckets=4, stopwords=("the",)))
    with pytest.raises(ValueError, match="stopwords"):
        MultiSearcher([a, b])
    # same config still opens fine
    c = str(tmp_path / "c2")
    build_index(corpus, cfg=IndexJobConfig(index_dir=c, term_buckets=4))
    assert MultiSearcher([a, c]).N > 0


def test_fold_ascii_stage_and_query_twin(tmp_path):
    """asciifolding: the prep stage folds the corpus, fold_query folds
    the query with the SAME kernel — accented and plain forms meet."""
    import pyarrow as pa
    import ray.data as rd

    from rayfts.analysis import FoldAscii, fold_ascii, fold_query
    from rayfts.build import build_index
    from rayfts.config import IndexJobConfig
    from rayfts.search import Searcher

    assert fold_ascii(pa.array(["héllo", "Ünïté", "plain"])).to_pylist() == \
        ["hello", "Unite", "plain"]
    assert fold_query("héllo WÖRLD") == "hello WORLD"
    t = pa.table(
        {
            "conv_id": pa.array(["c0"] * 3),
            "turn_idx": pa.array([0, 1, 2], pa.int64()),
            "role": pa.array(["user"] * 3),
            "text": pa.array(["héllo wörld", "hello again", "naïve plan"]),
            "tool": pa.array([None] * 3, pa.string()),
        }
    )
    ds = rd.from_arrow(t).map_batches(
        FoldAscii, batch_format="pyarrow", concurrency=1
    )
    idx = str(tmp_path / "folded")
    build_index(ds, cfg=IndexJobConfig(index_dir=idx, term_buckets=2))
    s = Searcher(idx)
    # accented and plain forms now share one posting list
    assert s.lookup("hello").df == 2
    assert s.lookup("héllo") is None
    assert s.lookup("naive").df == 1
    # folded query finds the folded index
    assert [d for d, _ in s.search(fold_query("hÉllo"), k=5)] == \
        [d for d, _ in s.search("hello", k=5)]


def test_reindex_full_filtered_and_remapped(tmp_path):
    """ES _reindex analog: full reindex is search-identical; a where
    filter subsets; tombstones drop; a mapping override (stopwords)
    takes effect in the new index."""
    from rayfts.admin import exclude_docs, reindex
    from rayfts.build import build_index
    from rayfts.config import IndexJobConfig
    from rayfts.fixtures import write_transcripts
    from rayfts.search import Searcher

    corpus = str(tmp_path / "c")
    write_transcripts(corpus, n_convs=10, seed=42)
    src = str(tmp_path / "src")
    build_index(corpus, cfg=IndexJobConfig(index_dir=src, term_buckets=4))
    s0 = Searcher(src)
    # 1) plain reindex == the source, query for query
    m = reindex(src, str(tmp_path / "full"))
    s1 = Searcher(str(tmp_path / "full"))
    assert s1.N == s0.N
    for q in ("the w0007 bash", "grep sed"):
        assert s1.search(q, k=20) == s0.search(q, k=20), q
    # 2) reindex-with-query: only user turns survive
    reindex(src, str(tmp_path / "users"), where={"role": "user"})
    s2 = Searcher(str(tmp_path / "users"))
    assert s2.N == s0.count(role="user")
    assert s2.count(role="tool") == 0
    # 3) tombstoned docs do not survive a reindex
    exclude_docs(src, [0, 1, 2])
    reindex(src, str(tmp_path / "purged"))
    s3 = Searcher(str(tmp_path / "purged"))
    assert s3.N == s0.N - 3
    assert s3.excluded.size == 0
    # 4) mapping override: a stopword vanishes from the new index
    reindex(src, str(tmp_path / "stopped"), stopwords=("the",))
    s4 = Searcher(str(tmp_path / "stopped"))
    assert s4.lookup("the") is None and s0.lookup("the") is not None
    assert m["n_docs"] == s0.N


def test_alias_lifecycle_and_atomic_swap(tmp_path):
    """ES alias analog: set/resolve/delete, unpublished-target rejection,
    the atomic rebuild-and-repoint swap, and a multi-index alias opening
    as a MultiSearcher."""
    from rayfts.admin import (
        delete_alias, list_aliases, open_alias, resolve_alias, set_alias,
    )
    from rayfts.build import build_index
    from rayfts.config import IndexJobConfig
    from rayfts.fixtures import write_transcripts
    from rayfts.search import MultiSearcher, Searcher

    corpus = str(tmp_path / "c")
    write_transcripts(corpus, n_convs=5, seed=42)
    reg = str(tmp_path / "reg")
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    with pytest.raises(FileNotFoundError):
        set_alias(reg, "live", a)  # unpublished target rejected
    build_index(corpus, cfg=IndexJobConfig(index_dir=a, term_buckets=4))
    set_alias(reg, "live", a)
    assert resolve_alias(reg, "live") == [a]
    s = open_alias(reg, "live")
    assert isinstance(s, Searcher) and s.N > 0
    # rebuild into b, repoint atomically — readers opened after see b
    build_index(corpus, cfg=IndexJobConfig(index_dir=b, term_buckets=4))
    set_alias(reg, "live", b)
    assert open_alias(reg, "live").index_dir == b
    # multi-index alias opens the sharded reader
    set_alias(reg, "both", [a, b])
    ms = open_alias(reg, "both")
    assert isinstance(ms, MultiSearcher) and ms.N == 2 * s.N
    assert sorted(list_aliases(reg)) == ["both", "live"]
    assert delete_alias(reg, "live") is True
    assert delete_alias(reg, "live") is False
    with pytest.raises(KeyError):
        resolve_alias(reg, "live")


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


def test_config_cascade_properties_file(tmp_path):
    """.properties key=value files load with the same precedence as JSON
    (ref ElasticSearchWriterFactory.java:51-54, utils/Parameters.java:51-82),
    with type coercion per field."""
    from rayfts.config import IndexJobConfig

    p = tmp_path / "job.properties"
    p.write_text(
        "# reference-style properties file\n"
        "! alt comment\n"
        "k1=1.5\n"
        "term_buckets=7\n"
        "overwrite=false\n"
        "detect_sorted_input=yes\n"
        "keyword_cols=role, tool\n"
        "salt_hot_terms=the,a\n"
        "unknown.key=ignored\n"
    )
    c = IndexJobConfig.from_file(str(p), term_buckets=9)
    assert c.k1 == 1.5
    assert c.term_buckets == 9        # explicit override wins
    assert c.overwrite is False
    assert c.detect_sorted_input is True
    assert c.keyword_cols == ("role", "tool")
    assert c.salt_hot_terms == ("the", "a")
    assert c.b == 0.75                # default preserved


def test_build_from_json_identical_to_parquet_build(tmp_path):
    """E2E source parity (round-2 verdict item 8): building the index from a
    JSON-lines export (ISO timestamps) through read_transcripts_json must
    produce postings files BYTE-identical to the parquet build and an
    equal docstore. JSON is the convert-at-read path: it normalizes to
    TRANSCRIPT_SCHEMA batches and flows through the same sort + build."""
    import pyarrow.parquet as pq

    from rayfts.build import build_index
    from rayfts.config import IndexJobConfig
    from rayfts.fixtures import generate_transcripts
    from rayfts.sources import read_transcripts_json

    t = generate_transcripts(20, seed=42)
    pq_path = tmp_path / "corpus.parquet"
    pq.write_table(t, pq_path)
    jl_path = tmp_path / "corpus.jsonl"
    with open(jl_path, "w") as f:
        for r in t.to_pylist():
            r = dict(r)
            r["ts"] = r["ts"].isoformat()
            f.write(json.dumps(r) + "\n")

    d_pq = str(tmp_path / "idx_pq")
    d_js = str(tmp_path / "idx_js")
    build_index(
        str(pq_path), cfg=IndexJobConfig(index_dir=d_pq, term_buckets=4)
    )
    build_index(
        read_transcripts_json(str(jl_path)),
        cfg=IndexJobConfig(index_dir=d_js, term_buckets=4),
    )
    for f_ in sorted(os.listdir(os.path.join(d_pq, "postings"))):
        with open(os.path.join(d_pq, "postings", f_), "rb") as fh:
            b1 = fh.read()
        with open(os.path.join(d_js, "postings", f_), "rb") as fh:
            b2 = fh.read()
        assert b1 == b2, f_
    s1 = pq.read_table(os.path.join(d_pq, "docstore")).sort_by(
        [("doc_id", "ascending")]
    )
    s2 = pq.read_table(os.path.join(d_js, "docstore")).sort_by(
        [("doc_id", "ascending")]
    )
    assert s1.equals(s2.select(s1.column_names).cast(s1.schema))


def test_delete_by_query_tombstones_hits(tmp_path):
    """_delete_by_query: exactly the (query AND filter) hit set
    tombstones; survivors serve every downstream path; idempotent
    (deleted=0 on rerun); query=None + where deletes filter-context
    style; clear_exclusions reverses."""
    from rayfts.admin import clear_exclusions, delete_by_query
    from rayfts.build import build_index
    from rayfts.config import IndexJobConfig
    from rayfts.fixtures import write_transcripts
    from rayfts.search import Searcher

    corpus = str(tmp_path / "c")
    write_transcripts(corpus, n_convs=12, seed=42)
    d = str(tmp_path / "idx")
    build_index(corpus, cfg=IndexJobConfig(index_dir=d, term_buckets=4))
    s0 = Searcher(d)
    hits = {doc for doc, _ in s0.search("the", k=10**6)}
    user_mask = s0.filter_mask(role="user")
    victims = {doc for doc in hits if user_mask[doc]}
    assert victims and victims != hits
    r = delete_by_query(d, "the", where={"role": "user"})
    assert r["deleted"] == len(victims)
    assert r["excluded_total"] == len(victims)
    s1 = Searcher(d)  # tombstones visible to readers opened after
    left = {doc for doc, _ in s1.search("the", k=10**6)}
    assert left == hits - victims
    assert s1.count(role="user") == len(
        {d2 for d2 in range(s0.N) if user_mask[d2]} - victims
    )
    # idempotent
    assert delete_by_query(d, "the", where={"role": "user"})["deleted"] == 0
    # match_all + filter (filter-context delete)
    r2 = delete_by_query(d, None, where={"role": "tool"})
    s2 = Searcher(d)
    assert s2.count(role="tool") == 0
    assert r2["deleted"] > 0
    clear_exclusions(d)
    s3 = Searcher(d)
    assert {doc for doc, _ in s3.search("the", k=10**6)} == hits


def test_update_by_query_rewrites_hits_only(tmp_path):
    """_update_by_query: matched docs carry the transformed field in the
    NEW index, unmatched docs the original; text edits reflect in the
    rebuilt postings; tombstones drop; schema-breaking chains raise."""
    import pyarrow.parquet as pq

    from rayfts.admin import exclude_docs, update_by_query
    from rayfts.build import build_index
    from rayfts.config import IndexJobConfig
    from rayfts.fixtures import write_transcripts
    from rayfts.ingest import UnsupportedProcessor
    from rayfts.search import Searcher

    corpus = str(tmp_path / "c")
    write_transcripts(corpus, n_convs=10, seed=42)
    src = str(tmp_path / "src")
    build_index(corpus, cfg=IndexJobConfig(index_dir=src, term_buckets=4))
    s0 = Searcher(src)
    hits = {d for d, _ in s0.search("bash", k=10**6)}
    assert hits
    exclude_docs(src, [0])
    out = str(tmp_path / "out")
    r = update_by_query(
        src, out, "bash",
        [{"gsub": {"field": "text", "pattern": "bash",
                   "replacement": "zsh"}}],
    )
    assert r["updated"] == len(hits) - (1 if 0 in hits else 0)
    s1 = Searcher(out)
    # postings rebuilt: 'bash' is gone from the updated docs, 'zsh' in
    assert {d for d, _ in s1.search("bash", k=10**6)} == set()
    assert len({d for d, _ in s1.search("zsh", k=10**6)}) == r["updated"]
    # tombstoned doc 0 dropped from the republished index
    old = pq.read_table(src + "/docstore", columns=["doc_id"])
    new = pq.read_table(out + "/docstore", columns=["doc_id"])
    assert new.num_rows == old.num_rows - 1
    with pytest.raises(UnsupportedProcessor):
        update_by_query(src, str(tmp_path / "bad"), "bash",
                        [{"remove": {"field": "role"}}])
