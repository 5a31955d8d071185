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

Every string processor is one Arrow compute kernel per batch — no
Python rows; the chain applies IN ORDER on the progressively-
transformed batch (the ES processor-array contract, same convention as
extras.redact). ``apply`` returns a lazily-transformed Dataset, so the
stage fuses with the build's read in the streaming executor.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

_KNOWN = ("set", "rename", "remove", "lowercase", "uppercase", "trim",
          "gsub", "enrich")


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
        }[kind]
        if not isinstance(body, dict) or set(body) != need:
            raise UnsupportedProcessor(
                f"{kind} needs exactly options {sorted(need)}"
            )


class IngestPipeline:
    """A validated processor chain; call ``transform_batch`` inside any
    map_batches, or ``apply`` to wrap a Dataset."""

    def __init__(self, processors: list[dict]):
        _check(processors)
        self.processors = list(processors)

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        t = batch
        for p in self.processors:
            kind, b = next(iter(p.items()))
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
                t = t.set_column(i, b["field"], col)
        return t

    def apply(self, ds: rd.Dataset) -> rd.Dataset:
        return ds.map_batches(
            self.transform_batch, batch_format="pyarrow",
            zero_copy_batch=True,
        )
