"""Deterministic seeded transcript corpus generator (FIXTURES.md §1).

Analog of the reference's fixed conformance corpus
(``src/test/resources/mondeville-20130123.osm`` with its exact 777/57 count
asserts, ``integration/PluginIntegrationITest.java:44-45``) and builder-style
row factories (``testutils/OsmDataBuilder.java:19-62``): everything is a pure
function of (n_convs, seed), never of wall-clock or parallelism.

Schema (BASELINE.json input_hint):
  (conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
   ts:timestamp[us])
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

VOCAB_SIZE = 5000
HOT_DIALOGUE = ["the", "a", "to", "ok"]
TOOL_NAMES = ["bash", "read", "write", "grep", "edit"]
HOT_TOKENS = HOT_DIALOGUE + TOOL_NAMES
EPOCH_2026_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds

# Frozen reference query set (FIXTURES.md §1 golden expectations).
REFERENCE_QUERIES = [
    "w0007",            # single term
    "the",              # hot term
    "w0007 bash",       # multi-term OR
    "w0001 w0001 the",  # repeated term in query
    "zzzz_absent",      # absent from corpus -> empty result
    "The",              # case-variant, == "the"
    "w0042 w0100 edit ok",
    "w0007^2 bash the^0.5",  # Lucene clause boosts (^b multiplies idf weight)
]


def _vocab() -> np.ndarray:
    return np.array([f"w{i:04d}" for i in range(VOCAB_SIZE)], dtype=object)


def _zipf_probs(s: float = 1.1) -> np.ndarray:
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    p = ranks ** (-s)
    return p / p.sum()


def generate_transcripts(
    n_convs: int = 50, seed: int = 42, conv_offset: int = 0
) -> pa.Table:
    """Build the corpus table. Deterministic in (n_convs, seed, conv_offset).

    ``conv_offset`` shifts the conv numbering so large corpora can be
    generated in independent deterministic chunks (see
    write_transcripts_chunked)."""
    rng = np.random.default_rng(seed)
    vocab = _vocab()
    probs = _zipf_probs()
    hot = np.array(HOT_TOKENS, dtype=object)

    turns_per_conv = 1 + (rng.integers(0, 1 << 30, size=n_convs) % 12)
    n_turns = int(turns_per_conv.sum())

    conv_idx = np.repeat(np.arange(n_convs), turns_per_conv)
    conv_ids = np.array(
        [f"conv-{i + conv_offset:07d}" for i in range(n_convs)], dtype=object
    )[conv_idx]
    turn_idx = (
        np.arange(n_turns) - np.repeat(np.cumsum(turns_per_conv) - turns_per_conv, turns_per_conv)
    ).astype(np.int32)

    # roles: cycle user/assistant; ~15% turns become tool turns
    role = np.where(turn_idx % 2 == 0, "user", "assistant").astype(object)
    tool_turn = rng.random(n_turns) < 0.15
    role[tool_turn] = "tool"
    tool_pick = hot[len(HOT_DIALOGUE) :][rng.integers(0, len(TOOL_NAMES), size=n_turns)]
    tool = np.where(tool_turn, tool_pick, None)

    # text: 3-60 tokens; token stream = 25% hot tokens, else Zipf vocab
    tok_counts = rng.integers(3, 61, size=n_turns)
    total_toks = int(tok_counts.sum())
    use_hot = rng.random(total_toks) < 0.25
    toks = np.where(
        use_hot,
        hot[rng.integers(0, hot.size, size=total_toks)],
        vocab[rng.choice(VOCAB_SIZE, size=total_toks, p=probs)],
    )
    # mixed case on ~2% of tokens so the lowercase path is exercised
    upper = rng.random(total_toks) < 0.02
    if upper.any():
        toks = toks.copy()
        toks[upper] = [t.capitalize() for t in toks[upper]]

    bounds = np.cumsum(tok_counts)[:-1]
    texts = [" ".join(chunk) for chunk in np.split(toks, bounds)]

    # deterministic edge rows (FIXTURES.md): empty text, punctuation/unicode,
    # one very long turn, identical text in two different convs
    if n_turns >= 8:
        texts[1] = "…"  # zero tokens after analysis -> dl=0
        texts[3] = "héllo, wörld! foo_bar"
        texts[5] = "same text across convs the w0007"
        texts[n_turns - 2] = "same text across convs the w0007"
        texts[7] = " ".join(["longturn"] + ["w%04d" % (i % 500) for i in range(8000)])

    ts = (
        EPOCH_2026_US
        + (conv_idx + conv_offset).astype(np.int64) * 86_400_000_000
        + turn_idx.astype(np.int64) * 1_000_000
    )

    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tool, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )


def write_transcripts(
    path: str, n_convs: int = 50, seed: int = 42, rows_per_file: int = 250_000
) -> str:
    """Write the corpus as one-or-more parquet files under ``path`` (a dir)."""
    import os

    os.makedirs(path, exist_ok=True)
    t = generate_transcripts(n_convs, seed)
    n = t.num_rows
    nfiles = max(1, (n + rows_per_file - 1) // rows_per_file)
    for i in range(nfiles):
        pq.write_table(
            t.slice(i * rows_per_file, rows_per_file),
            os.path.join(path, f"part-{i:05d}.parquet"),
        )
    return path


def write_transcripts_chunked(
    path: str,
    n_convs: int,
    seed: int = 42,
    convs_per_chunk: int = 200_000,
) -> str:
    """Large-corpus writer: independent deterministic chunks (seed+i,
    conv_offset) so generation is O(chunk) memory and restartable."""
    import os

    os.makedirs(path, exist_ok=True)
    i = 0
    for off in range(0, n_convs, convs_per_chunk):
        n = min(convs_per_chunk, n_convs - off)
        fpath = os.path.join(path, f"part-{i:05d}.parquet")
        if not os.path.exists(fpath):
            t = generate_transcripts(n, seed=seed + i, conv_offset=off)
            tmp = fpath + ".tmp"
            pq.write_table(t, tmp)
            os.replace(tmp, fpath)
        i += 1
    return path
