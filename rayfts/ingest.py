"""ES ingest-pipeline analog: a named chain of processors applied to
every document BEFORE indexing — the `PUT _ingest/pipeline` +
`index?pipeline=` surface the reference plugin's ES cluster provides
around the sink (reference parity: the plugin ships documents into ES,
where ingest pipelines transform them server-side; here the same chain
is a vectorized Ray Data stage in front of build_index).

Processor subset, failing loudly like the DSL executor (unknown
processors or option shapes raise, never approximate):

  set        {field, value}            — constant column (overwrites)
  rename     {field, target_field}     — move a column
  remove     {field}                   — drop a column
  lowercase  {field} / uppercase {field}
  trim       {field}                   — strip ascii whitespace
  gsub       {field, pattern, replacement} — RE2 regexp_replace
  enrich     {field, target_field, lookup}  — ES enrich-processor
             analog: the policy's match index is the small ``lookup``
             dict broadcast with the pipeline (index_in + take, one
             kernel pair); unmatched keys enrich to null
  grok       {field, pattern}               — ES grok processor: the
             %{SYNTAX:semantic} pattern compiles ONCE to an RE2 regex
             with named groups (pinned pattern subset below); one
             pc.extract_regex per batch, each named capture appended
             as a column via pc.struct_field (parent-null propagating,
             so non-matching rows yield null captures — the pipeline's
             on_failure → null convention, matching SQL regexp_extract)
  dissect    {field, pattern}               — ES dissect processor:
             %{key} fields between literal delimiters; compiled to the
             canonical anchored regex (non-greedy captures, greedy
             tail) and executed on the grok kernel path
  convert    {field, type}                  — type cast (integer/long ->
             int64, double, string, boolean); bad input RAISES (the ES
             convert default, no on_failure swallow)
  split      {field, separator}             — regex split into a
             list<string> column (ES split's separator is a regex)
  join       {field, separator}             — list<string> -> string
  csv        {field, target_fields, separator?} — unquoted-subset csv:
             compiled to one anchored ([^sep]*) regex on the grok
             kernel path (quote/empty handling beyond the subset
             refuses; non-matching rows -> null fields)
  date       {field, format, target_field}  — strptime into a
             timestamp(us) column (single pinned format, the ES
             formats-list subset); unparseable input raises
  drop       {field, equals}                — the ES drop processor's
             condition subset: remove documents whose field equals the
             constant (a vectorized row filter — the one processor
             that changes row count)
  html_strip {field}                        — tag-removal subset of the
             Lucene HTMLStripCharFilter: '<[^>]*>' -> '' (entities and
             script/style bodies are out of this pinned subset)
  fingerprint {fields, target_field}        — md5 hex of the
             '|'-joined field values (one md5 per DISTINCT joined
             string — the hash_tokens_unique trick)
  inference  {model_id, field, target_field} — the ES inference
             processor SHAPE with the model STUBBED (this sandbox has
             no model runtime): model_id must start with "fake-" and
             yields a deterministic bag-of-hashed-words projection
             (md5-lower64 token hashes scattered into a seeded random
             projection matrix, L2-normalized — rerun-stable across
             processes). The projection matrix is built ONCE at
             pipeline construction and ships with the broadcast
             pipeline object (the model-load-once actor rule); any
             other model_id raises NotImplementedError naming the
             integration point. Output: list<float> embedding column.

Every string processor is one Arrow compute kernel per batch — no
Python rows; the chain applies IN ORDER on the progressively-
transformed batch (the ES processor-array contract, same convention as
extras.redact). ``apply`` returns a lazily-transformed Dataset, so the
stage fuses with the build's read in the streaming executor.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

_KNOWN = ("set", "rename", "remove", "lowercase", "uppercase", "trim",
          "gsub", "enrich", "grok", "dissect", "convert", "split",
          "join", "csv", "date", "drop", "html_strip", "fingerprint",
          "inference")

FAKE_EMBED_DIM = 32  # the fake inference model's output width

_CONVERT_TYPES = {
    "integer": pa.int64(), "long": pa.int64(), "double": pa.float64(),
    "string": pa.string(), "boolean": pa.bool_(),
}

# The pinned grok pattern dictionary (the ES/logstash names this subset
# maps; anything else raises — never approximate). Kept RE2-safe so the
# compiled expression runs identically on Arrow's and DuckDB's RE2.
_GROK_PATTERNS = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
}

_GROK_REF = re.compile(r"%\{(\w+)(?::(\w+))?\}")


def compile_grok(pattern: str) -> str:
    """%{SYNTAX:semantic} grok pattern -> anchored RE2 with named
    groups. Unnamed refs (%{WORD}) match without capturing; unknown
    SYNTAX names raise UnsupportedProcessor."""
    out, pos = ["^"], 0
    for m in _GROK_REF.finditer(pattern):
        out.append(re.escape(pattern[pos:m.start()]))
        syntax, semantic = m.group(1), m.group(2)
        if syntax not in _GROK_PATTERNS:
            raise UnsupportedProcessor(f"grok pattern %{{{syntax}}}")
        body = _GROK_PATTERNS[syntax]
        out.append(f"(?P<{semantic}>{body})" if semantic
                   else f"(?:{body})")
        pos = m.end()
    out.append(re.escape(pattern[pos:]))
    out.append("$")
    return "".join(out)


_DISSECT_KEY = re.compile(r"%\{(\w*)\}")


def compile_dissect(pattern: str) -> str:
    """ES dissect pattern -> the canonical anchored regex: literals
    escaped, every %{key} a non-greedy named capture except a
    pattern-final key, which takes the greedy tail (the dissect
    'consume up to the next delimiter' rule). Empty-name skip keys
    (%{}) match without capturing; adjacent keys with no literal
    between them are refused (dissect needs delimiters)."""
    out, pos, last_end = ["^"], 0, None
    matches = list(_DISSECT_KEY.finditer(pattern))
    if not matches:
        raise UnsupportedProcessor("dissect pattern has no %{key}")
    for m in matches:
        lit = pattern[pos:m.start()]
        if last_end is not None and not lit:
            raise UnsupportedProcessor(
                "dissect keys need a literal delimiter between them"
            )
        out.append(re.escape(lit))
        body = ".*" if m.end() == len(pattern) else ".*?"
        name = m.group(1)
        out.append(f"(?P<{name}>{body})" if name else f"(?:{body})")
        pos = last_end = m.end()
    out.append(re.escape(pattern[pos:]))
    out.append("$")
    return "".join(out)


class UnsupportedProcessor(ValueError):
    """The pipeline uses a processor shape this engine does not map."""


def _check(procs: list[dict]) -> None:
    for p in procs:
        if not isinstance(p, dict) or len(p) != 1:
            raise UnsupportedProcessor(f"processor {p!r}")
        kind, body = next(iter(p.items()))
        if kind not in _KNOWN:
            raise UnsupportedProcessor(f"processor kind {kind!r}")
        need = {
            "set": {"field", "value"},
            "rename": {"field", "target_field"},
            "remove": {"field"},
            "lowercase": {"field"},
            "uppercase": {"field"},
            "trim": {"field"},
            "gsub": {"field", "pattern", "replacement"},
            "enrich": {"field", "target_field", "lookup"},
            "grok": {"field", "pattern"},
            "dissect": {"field", "pattern"},
            "convert": {"field", "type"},
            "split": {"field", "separator"},
            "join": {"field", "separator"},
            "csv": ({"field", "target_fields"},
                    {"field", "target_fields", "separator"}),
            "date": {"field", "format", "target_field"},
            "drop": {"field", "equals"},
            "html_strip": {"field"},
            "fingerprint": {"fields", "target_field"},
            "inference": {"model_id", "field", "target_field"},
        }[kind]
        allowed = need if isinstance(need, tuple) else (need,)
        if not isinstance(body, dict) or set(body) not in allowed:
            raise UnsupportedProcessor(
                f"{kind} needs exactly options {sorted(allowed[0])}"
            )
        if kind == "convert" and body["type"] not in _CONVERT_TYPES:
            raise UnsupportedProcessor(
                f"convert type {body['type']!r}"
            )


class IngestPipeline:
    """A validated processor chain; call ``transform_batch`` inside any
    map_batches, or ``apply`` to wrap a Dataset."""

    def __init__(self, processors: list[dict]):
        _check(processors)
        self.processors = list(processors)
        # grok/dissect regexes compile (and validate) ONCE here, so the
        # broadcast pipeline object ships ready-to-run patterns and a
        # bad pattern fails at PUT time, not mid-stream
        self._compiled: dict[int, tuple[str, tuple[str, ...]]] = {}
        for i, p in enumerate(self.processors):
            kind, b = next(iter(p.items()))
            if kind == "csv":
                sep = b.get("separator", ",")
                if len(sep) != 1 or sep in ("\\", "]", "^", '"'):
                    raise UnsupportedProcessor(
                        f"csv separator {sep!r} (single plain char only)"
                    )
                names = b["target_fields"]
                if (not names or not isinstance(names, list) or
                        len(set(names)) != len(names) or
                        any(not re.fullmatch(r"[^\d\W]\w*", str(n))
                            for n in names)):
                    raise UnsupportedProcessor(
                        f"csv target_fields {names!r} (unique "
                        "identifiers required)"
                    )
                cell = f"[^{re.escape(sep)}]*"
                rx = ("^" + re.escape(sep).join(
                    f"(?P<{n}>{cell})" for n in names) + "$")
                self._compiled[i] = (rx, tuple(names))
                continue
            if kind in ("grok", "dissect"):
                rx = (compile_grok(b["pattern"]) if kind == "grok"
                      else compile_dissect(b["pattern"]))
                try:
                    names = tuple(re.compile(rx).groupindex)
                except re.error as e:
                    # digit-leading / duplicated capture names reach
                    # the regex compiler — keep the module's contract
                    # (UnsupportedProcessor, never a raw re.error)
                    raise UnsupportedProcessor(
                        f"{kind} pattern {b['pattern']!r}: {e}"
                    ) from e
                if not names:
                    raise UnsupportedProcessor(
                        f"{kind} pattern captures no fields"
                    )
                for n in names:
                    if n in ("", b["field"]):
                        raise UnsupportedProcessor(
                            f"{kind} capture name {n!r}"
                        )
                self._compiled[i] = (rx, names)
            if kind == "inference":
                if not str(b["model_id"]).startswith("fake-"):
                    raise NotImplementedError(
                        f"inference model {b['model_id']!r}: no model "
                        "runtime in this environment — plug a real "
                        "encoder here (load it in this constructor, "
                        "batch-infer in transform_batch); only the "
                        "deterministic 'fake-*' stub runs in-sandbox"
                    )
                import numpy as _np

                # 'model load' happens ONCE here and ships with the
                # pipeline object: a seeded random projection table
                # (the stub's weights; seed pinned so reruns and the
                # tests see identical embeddings)
                rng = _np.random.default_rng(1234)
                self._fake_proj = rng.standard_normal(
                    (4096, FAKE_EMBED_DIM)
                )

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        t = batch
        for i, p in enumerate(self.processors):
            kind, b = next(iter(p.items()))
            if kind in ("grok", "dissect", "csv"):
                rx, names = self._compiled[i]
                ext = pc.extract_regex(
                    t[b["field"]].combine_chunks(), pattern=rx
                )
                for name in names:
                    # struct_field propagates the parent (non-match)
                    # null into the child — unlike StructArray.flatten
                    col = pc.struct_field(ext, name)
                    if name in t.column_names:
                        t = t.set_column(
                            t.column_names.index(name), name, col
                        )
                    else:
                        t = t.append_column(name, col)
                continue
            if kind == "set":
                v = pa.array([b["value"]] * t.num_rows)
                if b["field"] in t.column_names:
                    t = t.set_column(
                        t.column_names.index(b["field"]), b["field"], v
                    )
                else:
                    t = t.append_column(b["field"], v)
            elif kind == "rename":
                if b["target_field"] in t.column_names:
                    raise UnsupportedProcessor(
                        f"rename target {b['target_field']!r} exists"
                    )
                t = t.rename_columns([
                    b["target_field"] if c == b["field"] else c
                    for c in t.column_names
                ])
            elif kind == "remove":
                t = t.drop_columns([b["field"]])
            elif kind == "convert":
                i2 = t.column_names.index(b["field"])
                t = t.set_column(
                    i2, b["field"],
                    pc.cast(t[b["field"]], _CONVERT_TYPES[b["type"]]),
                )
            elif kind == "split":
                i2 = t.column_names.index(b["field"])
                t = t.set_column(
                    i2, b["field"],
                    pc.split_pattern_regex(t[b["field"]],
                                           pattern=b["separator"]),
                )
            elif kind == "join":
                i2 = t.column_names.index(b["field"])
                t = t.set_column(
                    i2, b["field"],
                    pc.binary_join(t[b["field"]], b["separator"]),
                )
            elif kind == "date":
                parsed = pc.strptime(t[b["field"]], format=b["format"],
                                     unit="us")
                tf = b["target_field"]
                if tf in t.column_names:
                    t = t.set_column(t.column_names.index(tf), tf,
                                     parsed)
                else:
                    t = t.append_column(tf, parsed)
            elif kind == "drop":
                keep = pc.invert(pc.fill_null(
                    pc.equal(t[b["field"]], b["equals"]), False
                ))
                t = t.filter(keep)
            elif kind == "inference":
                import numpy as _np

                from .analysis import tokens_flat
                from .extras.hashing import hash_tokens_unique

                flat, parent = tokens_flat(t[b["field"]])
                h = hash_tokens_unique(flat)
                vecs = _np.zeros((t.num_rows, FAKE_EMBED_DIM))
                if h.size:
                    rows = self._fake_proj[
                        (h % self._fake_proj.shape[0]).astype(_np.int64)
                    ]
                    _np.add.at(vecs, parent, rows)
                norms = _np.sqrt((vecs * vecs).sum(axis=1))
                norms[norms == 0] = 1.0
                vecs /= norms[:, None]
                col = pa.array(vecs.tolist(),
                               pa.list_(pa.float32()))
                tf = b["target_field"]
                if tf in t.column_names:
                    t = t.set_column(t.column_names.index(tf), tf, col)
                else:
                    t = t.append_column(tf, col)
            elif kind == "fingerprint":
                joined = pc.binary_join_element_wise(
                    *[pc.cast(t[f], pa.string()) for f in b["fields"]],
                    "|",
                )
                # one md5 per DISTINCT joined value (Zipf-friendly)
                enc = pc.dictionary_encode(joined.combine_chunks())
                import hashlib

                hexes = pa.array(
                    [None if v is None else
                     hashlib.md5(v.encode()).hexdigest()
                     for v in enc.dictionary.to_pylist()],
                    pa.string(),
                )
                fp = pc.take(hexes, enc.indices)
                tf = b["target_field"]
                if tf in t.column_names:
                    t = t.set_column(t.column_names.index(tf), tf, fp)
                else:
                    t = t.append_column(tf, fp)
            elif kind == "enrich":
                # ES enrich-processor analog: the enrich policy's match
                # index is the (small) ``lookup`` dict, broadcast with
                # the pipeline; unmatched keys enrich to null (the ES
                # missing-match rule without ignore_missing errors)
                keys = list(b["lookup"].keys())
                vals = [b["lookup"][k] for k in keys]
                idx = pc.index_in(t[b["field"]],
                                  value_set=pa.array(keys))
                enriched = pc.take(pa.array(vals), idx)
                if b["target_field"] in t.column_names:
                    t = t.set_column(
                        t.column_names.index(b["target_field"]),
                        b["target_field"], enriched,
                    )
                else:
                    t = t.append_column(b["target_field"], enriched)
            else:
                i = t.column_names.index(b["field"])
                col = t.column(b["field"])
                if kind == "lowercase":
                    col = pc.utf8_lower(col)
                elif kind == "uppercase":
                    col = pc.utf8_upper(col)
                elif kind == "trim":
                    col = pc.utf8_trim_whitespace(col)
                elif kind == "gsub":
                    col = pc.replace_substring_regex(
                        col, pattern=b["pattern"],
                        replacement=b["replacement"],
                    )
                elif kind == "html_strip":
                    col = pc.replace_substring_regex(
                        col, pattern="<[^>]*>", replacement="",
                    )
                t = t.set_column(i, b["field"], col)
        return t

    def apply(self, ds: rd.Dataset) -> rd.Dataset:
        return ds.map_batches(
            self.transform_batch, batch_format="pyarrow",
            zero_copy_batch=True,
        )

    def simulate(self, docs: list[dict],
                 verbose: bool = False) -> list:
        """ES ``_ingest/pipeline/_simulate`` analog: run the chain on
        sample docs WITHOUT indexing. Default form returns the final
        transformed docs; ``verbose=True`` returns, per processor, the
        doc states after that step (the ES verbose processor_results
        shape) — same vectorized kernels, applied one processor at a
        time over the whole sample batch. A ``drop`` processor removes
        docs from subsequent steps, exactly as in the stream."""
        t = pa.Table.from_pylist(docs)
        if not verbose:
            return self.transform_batch(t).to_pylist()
        steps = []
        for i, p in enumerate(self.processors):
            sub = IngestPipeline([p])
            sub._compiled = (
                {0: self._compiled[i]} if i in self._compiled else {}
            )
            t = sub.transform_batch(t)
            kind = next(iter(p))
            steps.append({"processor": kind, "docs": t.to_pylist()})
        return steps
