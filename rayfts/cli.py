"""CLI entry points — the plugin-registration analog (SURVEY S2).

The reference registers ``write-elasticsearch`` / ``wes`` task names with
Osmosis (ElasticSearchWriterPluginLoader.java:12-18); here the engine is
driven as ``python -m rayfts.cli <command>``:

  build   --input DIR --index DIR [--resume] [--config cfg.json] ...
  search  --index DIR --query "..." [-k 10] [--algo taat|wand]
  get     --index DIR --conv-id C --turn-idx N
  count   --index DIR [--role R] [--tool T]
  exclude --index DIR [--doc-ids 1,2,3 | --clear]
  info    --index DIR
  disk-usage --index DIR        (ES _disk_usage analog)
  profile --index DIR --query "..." [-k 10] [--algo taat|wand]

Owns its Ray session (guarded init — the driver contract forbids init
inside library code, but a CLI process is its own driver).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_build(args) -> int:
    ray = _ray_session()
    from .build import build_index
    from .config import IndexJobConfig

    cfg = (
        IndexJobConfig.from_file(args.config)
        if args.config
        else IndexJobConfig()
    )
    cfg = cfg.replace(index_dir=args.index, resume=args.resume)
    if args.dedup_keys:
        cfg = cfg.replace(dedup_keys=True)
    manifest = build_index(args.input, cfg=cfg, rows_per_part=args.rows_per_part)
    print(json.dumps(manifest["metrics"]))
    ray.shutdown()
    return 0


def cmd_search(args) -> int:
    from .search import Searcher

    after = None
    if args.after:
        d, sc = args.after.split(",")
        after = (int(d), float(sc))
    s = Searcher(args.index)
    if args.kind == "phrase":
        hits = s.search_phrase(
            args.query, k=args.k, offset=args.offset, search_after=after,
        )
    elif args.kind == "query_string":
        if args.offset or after is not None:
            raise SystemExit(
                "--offset/--after are not supported with --kind query_string"
            )
        hits = s.query_string(args.query, k=args.k)
    else:
        hits = s.search(
            args.query, k=args.k, algo=args.algo,
            offset=args.offset, search_after=after,
        )
    for rank, (doc_id, score) in enumerate(hits, 1 + args.offset):
        print(json.dumps({"rank": rank, "doc_id": doc_id, "score": score}))
    return 0


def cmd_dsl(args) -> int:
    """ES _search request-body execution: --body is the JSON request
    (or @path to read it from a file); prints the response JSON."""
    from .dsl import execute_dsl
    from .search import Searcher

    raw = args.body
    if raw.startswith("@"):
        with open(raw[1:]) as f:
            raw = f.read()
    body = json.loads(raw)
    out = execute_dsl(Searcher(args.index), body)
    print(json.dumps(out, default=str))
    return 0


def cmd_suggest(args) -> int:
    from .search import Searcher

    s = Searcher(args.index)
    if args.kind == "completion":
        rows = s.suggest_completion(args.text, size=args.size)
        out = [{"term": t, "df": d} for t, d in rows]
    elif args.kind == "phrase":
        rows = s.suggest_phrase(args.text, size=args.size)
        out = [{"phrase": p, "score": sc} for p, sc in rows]
    else:
        rows = s.suggest_term(args.text, size=args.size)
        out = [
            {"token": tok, "suggestion": t, "df": d, "score": sc}
            for tok, t, d, sc in rows
        ]
    for row in out:
        print(json.dumps(row))
    return 0


def cmd_get(args) -> int:
    from .search import Searcher

    t = Searcher(args.index).get([(args.conv_id, args.turn_idx)])
    print(json.dumps(t.to_pylist()[0], default=str))
    return 0


def cmd_count(args) -> int:
    from .search import Searcher

    filters = {}
    if args.role:
        filters["role"] = args.role
    if args.tool:
        filters["tool"] = args.tool
    print(Searcher(args.index).count(**filters))
    return 0


def cmd_exclude(args) -> int:
    """Tombstone doc ids (per-doc delete analog; ref EntityDao.delete,
    dao/EntityDao.java:269-280) or clear all tombstones."""
    from .admin import clear_exclusions, exclude_docs, excluded_docs

    if args.clear:
        clear_exclusions(args.index)
    elif args.doc_ids:
        exclude_docs(args.index, [int(d) for d in args.doc_ids.split(",")])
    print(json.dumps({"excluded": excluded_docs(args.index)}))
    return 0


def cmd_build_segments(args) -> int:
    """One resumable index per key-range input (SCALE.md segmenting):
    --inputs takes comma-separated parquet dirs/files, one SEGMENT each,
    in ascending key order (verified from the built docstores)."""
    ray = _ray_session()
    from .config import IndexJobConfig
    from .segments import build_segments

    cfg = (
        IndexJobConfig.from_file(args.config)
        if args.config
        else IndexJobConfig()
    )
    cfg = cfg.replace(resume=args.resume)
    dirs = build_segments(
        [p.strip() for p in args.inputs.split(",")],
        args.root,
        cfg=cfg,
        rows_per_part=args.rows_per_part,
    )
    print(json.dumps({"segments": dirs}))
    ray.shutdown()
    return 0


def cmd_compact(args) -> int:
    """Merge segments (or rewrite one index) purging tombstones — the ES
    ``_forcemerge``/expungeDeletes analog (rayfts.compact)."""
    ray = _ray_session()
    from .compact import compact_segments

    man = compact_segments(
        [p.strip() for p in args.segments.split(",")],
        args.out,
        rows_per_part=args.rows_per_part,
        resume=args.resume,
    )
    print(json.dumps({
        "n_docs": man["n_docs"],
        "purged_tombstones": man["purged_tombstones"],
        "metrics": man["metrics"],
    }))
    ray.shutdown()
    return 0


def cmd_search_root(args) -> int:
    """Query a segment root through MultiSearcher (global stats merge)."""
    ray = _ray_session()
    from .segments import open_multisearcher

    ms = open_multisearcher(args.root, shared=args.shared)
    for rank, (doc_id, score) in enumerate(
        ms.search(args.query, k=args.k, algo=args.algo), 1
    ):
        print(json.dumps({"rank": rank, "doc_id": doc_id, "score": score}))
    ray.shutdown()
    return 0


def cmd_alias(args) -> int:
    from .admin import delete_alias, list_aliases, set_alias

    if args.action == "set":
        if not args.targets:
            raise SystemExit("alias set needs --targets")
        set_alias(args.registry, args.name, args.targets)
    elif args.action == "delete":
        if not delete_alias(args.registry, args.name):
            raise SystemExit(f"unknown alias {args.name!r}")
    print(json.dumps(list_aliases(args.registry)))
    return 0


def cmd_terms_enum(args) -> int:
    from .search import Searcher

    rows = Searcher(args.index).terms_enum(
        args.prefix, size=args.size, min_df=args.min_df
    )
    for t, df in rows:
        print(json.dumps({"term": t, "df": df}))
    return 0


def cmd_analyze(args) -> int:
    from .search import Searcher

    toks = Searcher(args.index).analyze(args.text)
    print(json.dumps([{"token": t, "position": p} for t, p in toks]))
    return 0


def cmd_validate(args) -> int:
    from .search import Searcher

    print(json.dumps(Searcher(args.index).validate_query(args.query)))
    return 0


def cmd_info(args) -> int:
    from .manifest import load_manifest

    m = load_manifest(args.index)
    print(json.dumps({k: m[k] for k in
                      ("n_docs", "n_terms", "avgdl", "postings_bytes",
                       "term_buckets", "metrics")}))
    return 0


def cmd_disk_usage(args) -> int:
    from .admin import disk_usage

    print(json.dumps(disk_usage(args.index)))
    return 0


def cmd_profile(args) -> int:
    from .search import Searcher

    s = Searcher(args.index)
    hits, prof = s.profile_search(args.query, k=args.k, algo=args.algo)
    print(json.dumps({"hits": hits, "profile": prof}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="rayfts")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--input", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--config")
    b.add_argument("--resume", action="store_true")
    b.add_argument("--dedup-keys", action="store_true")
    b.add_argument("--rows-per-part", type=int, default=250_000)
    b.set_defaults(fn=cmd_build)

    s = sub.add_parser("search")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--algo", default="taat", choices=["taat", "wand"])
    s.add_argument("--offset", type=int, default=0,
                   help="ES from: skip the first N ranked hits")
    s.add_argument("--after", default=None, metavar="DOC_ID,SCORE",
                   help="search_after cursor: the previous page's last hit")
    s.add_argument("--kind", default="match",
                   choices=["match", "phrase", "query_string"],
                   help="query body type (the msearch per-line analog)")
    s.set_defaults(fn=cmd_search)

    ds = sub.add_parser(
        "dsl", help="ES _search request-body executor (JSON in/out)"
    )
    ds.add_argument("--index", required=True)
    ds.add_argument("--body", required=True,
                    help="request JSON, or @file to read from disk")
    ds.set_defaults(fn=cmd_dsl)

    sg = sub.add_parser("suggest", help="ES _suggest API analog")
    sg.add_argument("--index", required=True)
    sg.add_argument("--text", required=True)
    sg.add_argument("--kind", default="term",
                    choices=["term", "phrase", "completion"])
    sg.add_argument("--size", type=int, default=5)
    sg.set_defaults(fn=cmd_suggest)

    g = sub.add_parser("get")
    g.add_argument("--index", required=True)
    g.add_argument("--conv-id", required=True)
    g.add_argument("--turn-idx", type=int, required=True)
    g.set_defaults(fn=cmd_get)

    c = sub.add_parser("count")
    c.add_argument("--index", required=True)
    c.add_argument("--role")
    c.add_argument("--tool")
    c.set_defaults(fn=cmd_count)

    e = sub.add_parser("exclude")
    e.add_argument("--index", required=True)
    e.add_argument("--doc-ids", help="comma-separated doc ids to tombstone")
    e.add_argument("--clear", action="store_true")
    e.set_defaults(fn=cmd_exclude)

    bs = sub.add_parser("build-segments")
    bs.add_argument("--inputs", required=True,
                    help="comma-separated inputs, one segment each, key-ordered")
    bs.add_argument("--root", required=True)
    bs.add_argument("--config")
    bs.add_argument("--resume", action="store_true")
    bs.add_argument("--rows-per-part", type=int, default=250_000)
    bs.set_defaults(fn=cmd_build_segments)

    cp = sub.add_parser("compact")
    cp.add_argument("--segments", required=True,
                    help="comma-separated built index/segment dirs, key-ordered")
    cp.add_argument("--out", required=True)
    cp.add_argument("--resume", action="store_true")
    cp.add_argument("--rows-per-part", type=int, default=250_000)
    cp.set_defaults(fn=cmd_compact)

    sr = sub.add_parser("search-root")
    sr.add_argument("--root", required=True)
    sr.add_argument("--query", required=True)
    sr.add_argument("-k", type=int, default=10)
    sr.add_argument("--algo", default="taat", choices=["taat", "wand"])
    sr.add_argument("--shared", action="store_true",
                    help="decode segments once into the object store")
    sr.set_defaults(fn=cmd_search_root)

    te = sub.add_parser("terms-enum", help="ES _terms_enum analog")
    te.add_argument("--index", required=True)
    te.add_argument("--prefix", required=True)
    te.add_argument("--size", type=int, default=10)
    te.add_argument("--min-df", dest="min_df", type=int, default=1)
    te.set_defaults(fn=cmd_terms_enum)

    an = sub.add_parser("analyze", help="ES _analyze analog")
    an.add_argument("--index", required=True)
    an.add_argument("--text", required=True)
    an.set_defaults(fn=cmd_analyze)

    vq = sub.add_parser("validate", help="ES _validate/query analog")
    vq.add_argument("--index", required=True)
    vq.add_argument("--query", required=True)
    vq.set_defaults(fn=cmd_validate)

    i = sub.add_parser("info")
    i.add_argument("--index", required=True)
    i.set_defaults(fn=cmd_info)

    du = sub.add_parser("disk-usage", help="ES _disk_usage API analog")
    du.add_argument("--index", required=True)
    du.set_defaults(fn=cmd_disk_usage)

    pr = sub.add_parser("profile", help="ES profile-API analog")
    pr.add_argument("--index", required=True)
    pr.add_argument("--query", required=True)
    pr.add_argument("-k", type=int, default=10)
    pr.add_argument("--algo", choices=["taat", "wand"], default="taat")
    pr.set_defaults(fn=cmd_profile)

    al = sub.add_parser("alias", help="ES alias API analog")
    al.add_argument("action", choices=["set", "delete", "list"])
    al.add_argument("--registry", required=True)
    al.add_argument("--name", default="")
    al.add_argument("--targets", nargs="*", default=[])
    al.set_defaults(fn=cmd_alias)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
