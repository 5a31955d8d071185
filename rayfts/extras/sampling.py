"""Deterministic hash-based dataset splitting — the training-data
holdout/sampling operator.

A training pipeline needs splits that are (a) deterministic across reruns
and machines, (b) key-stable (every row of a conversation lands in the
same split), and (c) computable streamingly with no shuffle — exactly
what modulo-ing a cryptographic hash of the split key gives. This is the
standard web-scale recipe (hash(url) % N buckets); random_shuffle/sample
would violate (a) and (b).

The hash rule is pinned for the DuckDB oracle: bucket = the first 8 hex
chars of md5(key-as-string) parsed as an integer, modulo ``buckets``
(SQL twin: ``CAST(('0x' || substr(md5(key), 1, 8)) AS BIGINT) % buckets``).
A row is in the TRAIN split when bucket < train_buckets.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def md5_prefix_u32(keys) -> np.ndarray:
    """THE md5-prefix rule (first 8 hex chars as an int in [0, 2^32)) —
    the single definition shared by the hash-split stage and
    ``Searcher.random_score`` so their DuckDB oracle twin
    (``CAST(('0x' || substr(md5(k), 1, 8)) AS BIGINT)``) stays pinned to
    one implementation. One C-speed md5 per row; unavoidable without an
    Arrow md5 kernel — same note as exact_dedup."""
    return np.fromiter(
        (
            int(hashlib.md5(k.encode("utf-8")).hexdigest()[:8], 16)
            for k in keys
        ),
        dtype=np.int64,
        count=len(keys),
    )


def hash_bucket(keys: list[str], buckets: int = 100) -> np.ndarray:
    """md5-prefix bucket per key (see md5_prefix_u32)."""
    return md5_prefix_u32(keys) % buckets


class SplitAssigner:
    """Ray Data actor-pool stage: append ``split`` ("train"/"holdout")
    and ``bucket`` columns keyed on ``key_col`` (stringified — so int64
    doc ids and string conv ids both work). Streaming, shuffle-free,
    rerun-stable."""

    def __init__(self, key_col: str, buckets: int = 100,
                 train_buckets: int = 90):
        if buckets <= 0:
            raise ValueError("buckets must be positive")
        if not 0 <= train_buckets <= buckets:
            raise ValueError("train_buckets must be within [0, buckets]")
        self.key_col = key_col
        self.buckets = buckets
        self.train_buckets = train_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = [
            str(k) for k in batch[self.key_col].to_pylist()
        ]
        b = hash_bucket(keys, self.buckets)
        split = np.where(b < self.train_buckets, "train", "holdout")
        return batch.append_column(
            "bucket", pa.array(b, pa.int64())
        ).append_column("split", pa.array(split.tolist(), pa.string()))


def split_dataset(ds: rd.Dataset, key_col: str, buckets: int = 100,
                  train_buckets: int = 90,
                  concurrency=(1, 8)) -> rd.Dataset:
    """Append deterministic split columns to a Dataset (lazy)."""
    return ds.map_batches(
        SplitAssigner,
        fn_constructor_kwargs={
            "key_col": key_col,
            "buckets": buckets,
            "train_buckets": train_buckets,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def _block_heads(batch: pa.Table, key_col: str, stratum_col: str,
                 quota, quota_map_ref=None) -> pa.Table:
    """Per-block per-stratum q-smallest (rank, key) heads — the exact
    candidate set (any global top-q member is in its block's top-q).
    Null strata drop (the documented rule). Vectorized: one lexsort by
    (stratum code, rank, key) + the per-group cumcount cut — no per-row
    Python beyond the md5 ranks themselves. ``quota_map_ref`` (a
    ray.put dict stratum -> quota) overrides the scalar: the per-code
    quota gathers from the broadcast map, O(distinct strata in block)
    lookups."""
    enc = pc.dictionary_encode(batch[stratum_col].combine_chunks())
    codes = pc.fill_null(enc.indices, -1).to_numpy(zero_copy_only=False)
    keys = np.array(
        [str(k) for k in batch[key_col].to_pylist()], dtype=object
    )
    ranks = md5_prefix_u32(keys)
    order = np.lexsort((keys, ranks, codes))
    oc = codes[order]
    pos = np.arange(oc.size)
    starts = np.flatnonzero(np.r_[True, oc[1:] != oc[:-1]])
    grp_start = np.repeat(starts, np.diff(np.r_[starts, np.int64(oc.size)]))
    if quota_map_ref is not None:
        import ray

        qmap = ray.get(quota_map_ref)
        per_code = np.array(
            [int(qmap.get(v, 0)) for v in enc.dictionary.to_pylist()],
            dtype=np.int64,
        )
        qvec = per_code[np.clip(oc, 0, None)]
    else:
        qvec = np.int64(quota)
    keep = (oc >= 0) & ((pos - grp_start) < qvec)
    sel = order[keep]
    return pa.table({
        "stratum": pc.take(enc.dictionary, pa.array(codes[sel])),
        "rank": pa.array(ranks[sel], pa.int64()),
        "key": pa.array(keys[sel].tolist(), pa.string()),
    })


def stratified_boundaries(ds: rd.Dataset, key_col: str, stratum_col: str,
                          quota) -> dict:
    """Phase 1 of stratified quota sampling: per-stratum selection
    boundary = the quota-th smallest (md5rank, key) pair. Each block
    ships at most ``quota`` candidate rows per stratum it contains
    (O(blocks x strata x quota) total — the small side), the driver
    merges the heads. Returns {stratum: (rank, key)} — the LARGEST kept
    pair per stratum. ``quota`` is a scalar or a {stratum: quota} dict
    (per-stratum targets — the temperature-mixing input); zero/absent
    dict strata select nothing."""
    import ray

    fn_kwargs: dict = {"key_col": key_col, "stratum_col": stratum_col}
    if isinstance(quota, dict):
        if any(q < 0 for q in quota.values()):
            raise ValueError("quotas must be >= 0")
        # broadcast the quota map ONCE (object store), not per task
        fn_kwargs.update(quota=0, quota_map_ref=ray.put(dict(quota)))

        def qof(s):
            return int(quota.get(s, 0))
    else:
        if quota < 1:
            raise ValueError("quota must be >= 1")
        fn_kwargs.update(quota=quota)

        def qof(s):
            return int(quota)
    parts = ds.map_batches(
        _block_heads, fn_kwargs=fn_kwargs, batch_format="pyarrow"
    ).take_all()
    per: dict = {}
    for row in parts:
        per.setdefault(row["stratum"], []).append((row["rank"], row["key"]))
    return {
        s: sorted(pairs)[: qof(s)][-1]
        for s, pairs in per.items() if qof(s) > 0
    }


def stratified_sample(ds: rd.Dataset, key_col: str, stratum_col: str,
                      quota) -> rd.Dataset:
    """Deterministic per-stratum quota sampling — the per-domain-cap
    stage of a web-scale training pipeline: keep each stratum's
    ``quota`` rows (a scalar, or a {stratum: quota} dict for
    per-stratum targets) with the SMALLEST (md5-prefix rank, key) pairs.
    Rerun-stable and machine-independent (the hash-split recipe
    extended with a quota); equivalent to
    row_number() OVER (PARTITION BY stratum ORDER BY md5rank, key)
    <= quota, which is the SQL oracle twin.

    Dataflow: block-head candidates -> driver boundary merge
    (stratified_boundaries, O(strata) broadcast) -> ONE streaming
    filter pass; rows never shuffle. Unique keys make (rank, key)
    pairs unique, so the boundary predicate is exactly the row_number
    cutoff. Null-stratum rows drop."""
    bounds = stratified_boundaries(ds, key_col, stratum_col, quota)

    def keep(batch: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(batch[stratum_col].combine_chunks())
        codes = pc.fill_null(enc.indices, -1).to_numpy(
            zero_copy_only=False
        )
        vals = enc.dictionary.to_pylist()
        # per-DISTINCT-value boundary gather (the small side), then one
        # vectorized (rank, key) tuple compare over the rows
        has = np.zeros(len(vals) + 1, dtype=bool)
        br = np.zeros(len(vals) + 1, dtype=np.int64)
        bk = np.array([""] * (len(vals) + 1), dtype=object)
        for j, v in enumerate(vals):
            b = bounds.get(v)
            if b is not None:
                has[j], br[j], bk[j] = True, b[0], b[1]
        keys = np.array(
            [str(k) for k in batch[key_col].to_pylist()], dtype=object
        )
        ranks = md5_prefix_u32(keys)
        c = np.clip(codes, 0, None)
        mask = (codes >= 0) & has[c] & (
            (ranks < br[c]) | ((ranks == br[c]) & (keys <= bk[c]))
        )
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratum_counts(ds: rd.Dataset, stratum_col: str) -> dict:
    """Exact per-stratum row counts via map-side combine + one
    O(strata) groupby — the small side every mixing rule starts from.
    Null strata drop (the sampler's rule)."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(stratum_col).aggregate([([], "count_all")])
        return pa.table({"stratum": g[stratum_col], "n": g["count_all"]})

    out: dict = {}
    for r in (
        ds.map_batches(partial, batch_format="pyarrow").take_all()
    ):
        s = r["stratum"]
        if s is None:
            continue
        out[s] = out.get(s, 0) + int(r["n"])
    return out


def temperature_resample(ds: rd.Dataset, key_col: str, stratum_col: str,
                         alpha: float = 0.5,
                         mult: int = 1) -> tuple[rd.Dataset, dict]:
    """Temperature-based mixture resampling — the multinomial
    data-mixing rule of multilingual/multi-domain pretraining (sample
    stratum s with probability proportional to n_s^alpha, alpha < 1
    flattening the mixture toward the tail): per-stratum quota =
    floor(n_s^alpha) * mult, then the deterministic md5-rank quota
    sampler keeps exactly that many rows per stratum. Returns
    (lazy kept Dataset, the quota map).

    Exactness note, pinned for the SQL oracle: at the alpha = 0.5
    default the quota is floor(sqrt(n_s)) * mult — for n < 2^52 a
    correctly-rounded double sqrt (numpy and DuckDB both) floors to
    the exact integer sqrt, so the engine and the oracle compute the
    SAME quota from the same counts; other alphas share one float
    ``n ** alpha`` expression with the oracle's pow() (document the
    ulp caveat if you pick one).

    Scale shape: counts are a map-combined O(strata) groupby, the
    quota map broadcasts once, and the sampler is block-head
    candidates -> O(strata) boundary merge -> ONE streaming filter —
    rows never shuffle."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    if mult < 1:
        raise ValueError("mult must be >= 1")
    counts = stratum_counts(ds, stratum_col)
    quota = {
        s: int(np.floor(np.float64(n) ** np.float64(alpha))) * mult
        for s, n in counts.items()
    }
    return stratified_sample(ds, key_col, stratum_col, quota), quota


def _ntile_of(r0: np.ndarray, n_rows: int, n_bins: int) -> np.ndarray:
    """SQL ntile bucket (1-based) for 0-based ranks: the first
    ``n_rows % n_bins`` buckets take ceil(n/b) rows, the rest floor —
    exactly DuckDB/ANSI ntile over the same total order."""
    q, rem = divmod(n_rows, n_bins)
    cutoff = rem * (q + 1)
    r0 = np.asarray(r0, dtype=np.int64)
    return np.where(
        r0 < cutoff, r0 // (q + 1), rem + (r0 - cutoff) // max(q, 1)
    ) + 1


def ntile_bins(ds: rd.Dataset, value_col: str, key_col: str,
               n_bins: int = 10) -> rd.Dataset:
    """Exact percentile binning — curriculum/quality bucketing for a
    training mix: append ``bin`` = ntile(``n_bins``) OVER (ORDER BY
    value, key), bit-identical to the SQL window twin. Null values
    drop (the sampler family's rule).

    Distributed shape: rows never shuffle. Pass 1 is a map-combined
    exact VALUE histogram (driver holds O(distinct values) — bounded
    for the integral quality metrics this bins: lengths, token counts,
    scaled scores). Value groups whose global rank range falls inside
    one bucket (all but <= n_bins-1 of them) are assigned by a
    broadcast value->bin map in ONE streaming pass; only the straddling
    groups — the <= n_bins-1 values sitting on bucket boundaries — go
    through a keyed ``map_groups`` that ranks within the group by key.
    Caveat (documented bound): one straddling group sorts on one
    worker, so a single value covering a large corpus fraction needs
    that group to fit a worker heap — same bound class as sessionize's
    per-user groups."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")

    def vpart(batch: pa.Table) -> pa.Table:
        g = batch.group_by(value_col).aggregate([([], "count_all")])
        return pa.table({"v": g[value_col], "n": g["count_all"]})

    hist: dict = {}
    for r in ds.map_batches(vpart, batch_format="pyarrow").take_all():
        if r["v"] is None:
            continue
        hist[r["v"]] = hist.get(r["v"], 0) + int(r["n"])
    if not hist:
        raise ValueError(f"no non-null values in {value_col!r}")
    svals = sorted(hist)
    cnts = np.array([hist[v] for v in svals], dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(cnts)[:-1]])
    n_rows = int(cnts.sum())
    first = _ntile_of(starts, n_rows, n_bins)
    last = _ntile_of(starts + cnts - 1, n_rows, n_bins)
    whole = {
        v: int(b) for v, b, f in zip(svals, first, first == last) if f
    }
    straddle = {
        v: int(s) for v, s, f in zip(svals, starts, first == last)
        if not f
    }
    import ray

    maps_ref = ray.put((whole, straddle, n_rows, n_bins))

    def assign(batch: pa.Table) -> pa.Table:
        # vectorized gather: searchsorted into the sorted whole-value
        # array (integral metrics — the documented use); nulls and
        # straddling values drop here (the hard branch owns the latter)
        w, st, nr, nb = ray.get(maps_ref)
        wv = np.array(sorted(w), dtype=np.int64)
        wb = np.array([w[v] for v in sorted(w)], dtype=np.int64)
        col = batch[value_col].combine_chunks()
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        vals = pc.fill_null(col, int(wv[0])).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        pos = np.searchsorted(wv, vals)
        cp = np.clip(pos, 0, wv.size - 1)
        hit = valid & (pos < wv.size) & (wv[cp] == vals)
        b = batch.filter(pa.array(hit.tolist(), type=pa.bool_()))
        return b.append_column(
            "bin", pa.array(wb[cp[hit]], pa.int64())
        )

    easy = (ds.map_batches(assign, batch_format="pyarrow")
            if whole else None)
    if not straddle:
        return easy  # hist is non-empty, so whole is too

    def rank_group(group: pa.Table) -> pa.Table:
        w, st, nr, nb = ray.get(maps_ref)
        v = group[value_col][0].as_py()
        order = np.argsort(
            np.asarray(group[key_col].to_numpy(zero_copy_only=False)),
            kind="stable",
        )
        r0 = np.empty(group.num_rows, dtype=np.int64)
        r0[order] = st[v] + np.arange(group.num_rows)
        return group.append_column(
            "bin", pa.array(_ntile_of(r0, nr, nb), pa.int64())
        )

    hard = (
        ds.map_batches(
            lambda t: t.filter(pa.array(
                [v in straddle for v in t[value_col].to_pylist()],
                type=pa.bool_(),
            )),
            batch_format="pyarrow",
        )
        .groupby(value_col)
        .map_groups(rank_group, batch_format="pyarrow")
    )
    return hard if easy is None else easy.union(hard)


# ---------------------------------------------------------------------------
# DSIR — data selection via importance resampling (Xie et al. 2023,
# arXiv:2302.03169): hashed-unigram importance weights
# ---------------------------------------------------------------------------

def dsir_bucket_counts(ds: rd.Dataset, target_col: str,
                       target_value, n_buckets: int = 256,
                       text_col: str = "text"):
    """Pass 1 of DSIR: hashed-token bucket histograms of the TARGET
    slice (rows where ``target_col == target_value`` — the trusted
    domain) and of the RAW corpus. Token hash = md5-lower64 % n_buckets
    (the family rule, == DuckDB ``md5_number_lower(term) %``). One
    map-combined streaming pass (each batch emits O(n_buckets) partial
    rows) + a tiny groupby; the driver holds 2·n_buckets ints.
    Returns (raw_counts, tgt_counts) int64 arrays of token INSTANCE
    counts."""
    from ray.data.aggregate import Sum

    from ..analysis import tokens_flat
    from .hashing import hash_tokens_unique

    def partial(b: pa.Table) -> pa.Table:
        flat, parent = tokens_flat(b[text_col])
        if len(flat) == 0:
            return pa.table({
                "bucket": pa.array([], pa.int64()),
                "raw_p": pa.array([], pa.int64()),
                "tgt_p": pa.array([], pa.int64()),
            })
        h = (hash_tokens_unique(flat) % np.uint64(n_buckets)).astype(
            np.int64
        )
        raw = np.bincount(h, minlength=n_buckets)
        is_t = pc.equal(b[target_col], pa.scalar(target_value)) \
            .to_numpy(zero_copy_only=False)
        tgt = np.bincount(h[is_t[parent]], minlength=n_buckets)
        return pa.table({
            "bucket": pa.array(np.arange(n_buckets, dtype=np.int64)),
            "raw_p": pa.array(raw.astype(np.int64)),
            "tgt_p": pa.array(tgt.astype(np.int64)),
        })

    t = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("raw_p"), Sum("tgt_p"))
        .to_pandas()
        .sort_values("bucket")
    )
    raw = np.zeros(n_buckets, dtype=np.int64)
    tgt = np.zeros(n_buckets, dtype=np.int64)
    raw[t["bucket"].to_numpy()] = t["sum(raw_p)"].to_numpy()
    tgt[t["bucket"].to_numpy()] = t["sum(tgt_p)"].to_numpy()
    return raw, tgt


def dsir_log_ratio(raw: np.ndarray, tgt: np.ndarray) -> np.ndarray:
    """Laplace-smoothed per-bucket log importance ratio:
    ln((tgt_b + 1) / (NT + B)) − ln((raw_b + 1) / (NR + B)) — every
    double from exact integer counts via the expression the SQL twin
    repeats."""
    B = raw.size
    nt, nr = int(tgt.sum()), int(raw.sum())
    return (np.log((tgt + 1).astype(np.float64) / (nt + B))
            - np.log((raw + 1).astype(np.float64) / (nr + B)))


def dsir_scores(ds: rd.Dataset, log_ratio: np.ndarray,
                id_col: str = "doc_id",
                text_col: str = "text") -> rd.Dataset:
    """Pass 2 of DSIR: per-document log importance weight
    logw(d) = Σ_instances log_ratio[h(token)] — the log of the paper's
    product-of-features weight. The O(n_buckets) ratio table broadcasts
    once via ray.put (read per actor, not per batch); docs with zero
    tokens DROP (the SQL twin's inner-join semantics). Returns
    Dataset(id_col, logw)."""
    import ray

    ref = ray.put(np.asarray(log_ratio, dtype=np.float64))

    class Scorer:
        def __init__(self):
            from ..analysis import tokens_flat as tf

            self.lr = ray.get(ref)
            self.nb = np.uint64(self.lr.size)
            self.tf = tf

        def __call__(self, b: pa.Table) -> pa.Table:
            from .hashing import hash_tokens_unique

            flat, parent = self.tf(b[text_col])
            n = b.num_rows
            logw = np.zeros(n, dtype=np.float64)
            if len(flat):
                h = (hash_tokens_unique(flat) % self.nb).astype(np.int64)
                np.add.at(logw, parent, self.lr[h])
            has = np.zeros(n, dtype=bool)
            has[parent] = True
            return pa.table({
                id_col: b[id_col].filter(pa.array(has)),
                "logw": pa.array(logw[has]),
            })

    return ds.map_batches(Scorer, batch_format="pyarrow",
                          concurrency=(1, 8))
