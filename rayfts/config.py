"""Job configuration — mirror of the reference's Parameters cascade.

Reference: ``utils/Parameters.java:9-26`` (knob inventory) and
``ElasticSearchWriterFactory.buildPluginParameters``
(``ElasticSearchWriterFactory.java:46-73``) — precedence = shipped defaults
-> optional config file -> explicit overrides. Same precedence here:
dataclass defaults -> ``from_file`` (JSON) -> ``replace(...)`` kwargs.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass


@dataclass(frozen=True)
class IndexJobConfig:
    # index lifecycle (ref: index.name / index.create, plugin.properties:6-7)
    index_dir: str = "/tmp/rayfts_index"
    overwrite: bool = True          # ref drops existing index (IndexAdminService.java:22)
    resume: bool = False            # OUR addition: skip manifest-complete partitions

    # analyzer / schema (ref: mappings plugin.properties:10-11)
    text_col: str = "text"
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx")   # ES _id analog
    dedup_keys: bool = False    # ES upsert analog: collapse duplicate keys
    dedup_order_col: str = "ts" # ...keeping the row with the max value here
    detect_sorted_input: bool = True  # verified fast path skipping the sort
    keyword_cols: tuple[str, ...] = ("role", "tool")      # not_analyzed twins
    # Index-time stop list (Lucene StopFilter / ES analyzer stopwords):
    # stop tokens are dropped from postings AND norms (dl counts emitted
    # tokens), but their POSITIONS remain as gaps in the positional
    # sidecar (enablePositionIncrements=true), so phrase queries across
    # removed stopwords keep Lucene semantics. The list is recorded in
    # the manifest and applied to queries by every Searcher (same
    # analyzer at index and query time).
    stopwords: tuple[str, ...] = ()
    # Index-time stemmer (ES analyzer ``stemmer`` token filter). Supported:
    # "" (off) | "minimal_english" (Lucene EnglishMinimalStemFilter — the
    # Harman S-stemmer). Runs AFTER the stop filter, token->token 1:1, so
    # positions and norms are unaffected; recorded in the manifest and
    # applied to query terms by every Searcher (one analyzer both sides).
    stemmer: str = ""
    # Index-time shingles (Lucene ShingleFilter / ES search_as_you_type
    # ``._Ngram`` subfield): 0/1 = off; n>1 replaces the unigram stream
    # with adjacent n-token space-joined windows per doc (one per start
    # position; dl = shingle count). Recorded in the manifest; queries
    # shingle with the same n in every Searcher, and match_bool_prefix
    # prefix-matches the LAST shingle (the SAYT in-flight word).
    shingle_size: int = 0
    # Index-time edge prefixes (ES `index_prefixes` on text fields): ()
    # = off; (min_chars, max_chars) replaces the unigram stream with
    # each token's codepoint prefixes of those lengths, so a prefix
    # query whose length is in range resolves by ONE exact dictionary
    # probe (`Searcher.prefix_exact_docs`) instead of a term scan.
    index_prefixes: tuple = ()

    # F7 dynamic tags: pack these columns into a map<string,string> `tags`
    # column carried through the docstore (ref ESEntity.java:14,18-22 tags
    # map + dynamic mapping templates, plugin.properties:10-11); null
    # values are omitted per row (dynamic-map semantics)
    tag_map_cols: tuple[str, ...] = ()

    # batching (ref: bulk sizes 5000/500, plugin.properties:15-16)
    analyze_batch_size: int = 8192
    merge_batch_size: int = 1024

    # parallelism (ref: worker pool 5, queue 100, plugin.properties:14,17)
    # query actor pools; the build uses elastic stateless tasks
    actor_pool_size: tuple[int, int] = (1, 8)
    num_docstore_partitions: int = 0   # 0 = one per sorted block
    term_buckets: int = 32             # postings layout shards (ref: ES shards=5)

    # BM25 (Lucene defaults; north_star)
    k1: float = 1.2
    b: float = 0.75

    # positional postings (Lucene .pos analog): store each term occurrence's
    # within-doc token position as a third varint stream per term, enabling
    # phrase queries (Searcher.search_phrase). Off by default — positions
    # roughly double the analyze/shuffle payload (one value per token
    # occurrence instead of one per distinct (term, doc) pair), the classic
    # Lucene index-options trade-off (docs_and_freqs vs ..._and_positions).
    index_positions: bool = False

    # postings-exchange stream codec: "u16" ships doc-gap/tf streams as
    # fixed-width little-endian ints (u32 fallback per stream if values
    # overflow) — 4x fewer bytes than raw int64 lists at pure cast cost,
    # the right default when the exchange is an in-memory object-store copy
    # (single node / colocated). "varint" LEB128-encodes the streams
    # (~1-2 B/posting, ~8x cut) — measured 1.8x slower end-to-end on a
    # memory-bandwidth-bound single node (extra encode/decode passes), but
    # the right choice when the exchange crosses a real network at
    # multi-node scale. Both produce byte-identical index files.
    exchange_codec: str = "u16"

    # hot-term salting (SURVEY §4 skew row; ref analog: ES hashes _id
    # across 5 shards, plugin.properties:8). A Zipf-head term ("the") at
    # 10^12 turns has ~10^11 postings — without salting ONE reduce task
    # decodes/sorts/encodes all of them. With salting, a hot term's shards
    # bypass the natural bucket and are merged per contiguous docID salt
    # range by parallel tasks (each encodes a 128-aligned posting range),
    # then stitched with codec.concat_postings — the bucket file is
    # BYTE-IDENTICAL to the unsalted build (pinned by tests).
    salt_hot_terms: tuple[str, ...] = ()  # explicit hot terms (always salted)
    salt_df_threshold: int = 0   # >0: auto-detect terms with estimated
                                 # global df >= threshold via a sample pre-pass
    hot_term_salts: int = 4      # parallel salt ranges per hot term
    hot_sample_rows: int = 50_000  # pre-pass sample size (first partition)
    max_hot_terms: int = 64      # detection cap (highest-df first)

    # hierarchical combine: when a bucket merge would gather more than
    # this many map shards, insert an intermediate concat level (tree
    # reduce) — at 10^6 partitions a flat gather per bucket is the
    # bottleneck. 0 disables (flat gather; fine up to ~10^3 partitions).
    # Combining is pure stream/array concatenation — no decode/re-encode.
    merge_fanin: int = 0

    @staticmethod
    def from_file(path: str, **overrides) -> "IndexJobConfig":
        """Load config from JSON or ``.properties`` (key=value) — the
        reference's file format (ElasticSearchWriterFactory.java:51-54,
        utils/Parameters.java:51-82). Same precedence either way:
        defaults -> file -> explicit overrides. Properties values are
        coerced by the target field's type (bool/int/float/tuple via
        comma-split)."""
        if path.endswith(".properties"):
            data = _parse_properties(path)
        else:
            with open(path) as f:
                data = json.load(f)
        data.update(overrides)
        fields = {f.name for f in dataclasses.fields(IndexJobConfig)}
        return IndexJobConfig(**{k: v for k, v in data.items() if k in fields})

    def replace(self, **kw) -> "IndexJobConfig":
        return dataclasses.replace(self, **kw)


def _parse_properties(path: str) -> dict:
    """Java-style ``key=value`` properties: '#'/'!' comments, blank lines
    skipped, values type-coerced to the matching dataclass field (booleans
    accept true/false/yes/no/1/0; tuple fields split on commas)."""
    import typing

    hints = typing.get_type_hints(IndexJobConfig)
    fields = {f.name: f for f in dataclasses.fields(IndexJobConfig)}
    out: dict = {}
    with open(path) as f:
        for raw in f:
            line = raw.strip()
            if not line or line[0] in "#!":
                continue
            if "=" not in line:
                raise ValueError(f"malformed properties line: {raw!r}")
            key, _, val = line.partition("=")
            key, val = key.strip(), val.strip()
            if key not in fields:
                out[key] = val  # unknown keys dropped by from_file (ref-compat)
                continue
            hint = hints[key]
            origin = typing.get_origin(hint)
            if hint is bool:
                out[key] = val.lower() in ("true", "yes", "1")
            elif hint is int:
                out[key] = int(val)
            elif hint is float:
                out[key] = float(val)
            elif origin is tuple:
                items = [v.strip() for v in val.split(",") if v.strip()]
                args = typing.get_args(hint)
                if args and args[0] is int:
                    out[key] = tuple(int(v) for v in items)
                else:
                    out[key] = tuple(items)
            else:
                out[key] = val
    return out
