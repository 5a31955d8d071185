"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a ``kind`` and a
JSON ``meta`` string. The Ray-side plumbing — schema, small batch sizes for
wide rows, actor-pool decode stages, output layout — is real and tested;
the actual codec decode is STUBBED: the container ships no image/audio
libraries, so ``MediaDecoder`` tries to import them and otherwise uses a
deterministic header-parsing fake (clearly marked). Swapping in a real
decoder is a one-method change.

Scale notes: binary rows are wide — the decode stage uses small
``batch_size`` so batch x concurrency fits worker heaps (driver brief:
"large binary payloads need small batches"), and the stage is an actor
pool so codec setup happens once per actor.
"""

from __future__ import annotations

import hashlib
import json
import zlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),      # "image" | "audio" | "video"
        ("payload", pa.binary()),   # opaque encoded bytes
        ("meta", pa.string()),      # JSON: {"format": ..., "w": ..., "h": ...}
    ]
)

_MAGIC = b"RFTS"


def synth_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media: payload = MAGIC + kind byte + w/h (be16) +
    n_frames (be16) + seeded noise bytes. Stands in for real encoded
    frames (n_frames > 1 only for videos)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    ids, ks, payloads, metas = [], [], [], []
    for i in range(n):
        kind = kinds[i % 3]
        w = int(rng.integers(16, 512))
        h = int(rng.integers(16, 512))
        n_frames = int(rng.integers(8, 40)) if kind == "video" else 1
        body = rng.integers(0, 256, size=int(rng.integers(200, 2000)), dtype=np.uint8)
        payload = (
            _MAGIC
            + bytes([kinds.index(kind)])
            + w.to_bytes(2, "big")
            + h.to_bytes(2, "big")
            + n_frames.to_bytes(2, "big")
            + body.tobytes()
        )
        ids.append(i)
        ks.append(kind)
        payloads.append(payload)
        metas.append(
            json.dumps(
                {"format": "rfts-fake", "w": w, "h": h, "n_frames": n_frames}
            )
        )
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(ks, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta": pa.array(metas, pa.string()),
        }
    )


_HDR = len(_MAGIC) + 1 + 2 + 2 + 2  # magic + kind + w + h + n_frames


class MediaDecoder:
    """Actor-pool decode stage: codec setup ONCE per actor in __init__.

    Emits per-item features: (media_id, kind, width, height, n_bytes,
    content_hash, feat: list<float> 8-dim deterministic descriptor).
    """

    def __init__(self):
        self._pil = None
        try:  # real decoder, if the environment ships it (setup once/actor)
            import PIL.Image as _pil

            self._pil = _pil
        except ImportError:
            self._pil = None
        self.real_codec = "pillow" if self._pil is not None else None

    def _decode_one(self, payload: bytes):
        if payload[:4] == _MAGIC:
            # deterministic fake container (the sandbox default): header
            # carries the dimensions directly
            w = int.from_bytes(payload[5:7], "big")
            h = int.from_bytes(payload[7:9], "big")
            return w, h
        if self._pil is not None:
            # real path: decode actual PNG/JPEG/... bytes via Pillow
            import io

            with self._pil.open(io.BytesIO(payload)) as im:
                return int(im.width), int(im.height)
        raise NotImplementedError(
            "payload is not the fake container and no image codec is "
            "installed — pip install Pillow to decode real formats"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, kinds, widths, heights, sizes, hashes, feats = [], [], [], [], [], [], []
        for mid, kind, payload in zip(
            batch["media_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            w, h = self._decode_one(payload)
            digest = hashlib.md5(payload).digest()
            feat = [
                b / 255.0
                for b in digest[:8]
            ]  # deterministic 8-dim descriptor stand-in
            ids.append(mid)
            kinds.append(kind)
            widths.append(w)
            heights.append(h)
            sizes.append(len(payload))
            hashes.append(zlib.crc32(payload))
            feats.append(feat)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "n_bytes": pa.array(sizes, pa.int64()),
                "content_hash": pa.array(hashes, pa.int64()),
                "feat": pa.array(feats, pa.list_(pa.float64())),
            }
        )


def decode_media(ds, concurrency=(1, 4), batch_size: int = 32):
    """The decode pipeline: small batches (wide binary rows), actor pool."""
    return ds.map_batches(
        MediaDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class MediaResizer:
    """Actor-pool resize stage (stubbed codec, real plumbing): scales each
    item to fit ``max_side`` preserving aspect ratio. The fake 're-encode'
    rewrites the header dimensions and truncates the body proportionally
    to the area ratio — a real implementation swaps only the per-item
    transform. Output schema mirrors the input (payload replaced)."""

    def __init__(self, max_side: int = 256):
        self.max_side = max_side

    def _resize_one(self, payload: bytes) -> bytes:
        if payload[:4] != _MAGIC:
            raise ValueError("unrecognized media payload")
        w = int.from_bytes(payload[5:7], "big")
        h = int.from_bytes(payload[7:9], "big")
        scale = min(1.0, self.max_side / max(w, h))
        nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
        body = payload[_HDR:]
        keep = max(1, int(len(body) * (nw * nh) / (w * h)))
        return (
            payload[:5]
            + nw.to_bytes(2, "big")
            + nh.to_bytes(2, "big")
            + payload[9:11]
            + body[:keep]
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = [self._resize_one(p) for p in batch["payload"].to_pylist()]
        return batch.set_column(
            batch.column_names.index("payload"), "payload", pa.array(out, pa.binary())
        )


def resize_media(ds, max_side: int = 256, concurrency=(1, 4), batch_size: int = 32):
    return ds.map_batches(
        MediaResizer,
        fn_constructor_kwargs={"max_side": max_side},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FrameSampler:
    """Flat-map stage: one OUTPUT ROW per sampled frame of each video item
    (non-video rows emit nothing) — the frame-explosion plumbing a video
    corpus needs before per-frame feature extraction. The fake 'container
    demux' splits the body into n_frames equal chunks; a real demuxer
    swaps in per item. Emits (media_id, frame_idx, ts_ms, frame_bytes)."""

    def __init__(self, every_n: int = 4, fps: float = 10.0):
        assert every_n >= 1
        self.every_n = every_n
        self.fps = fps

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, ts, frames = [], [], [], []
        for mid, kind, payload in zip(
            batch["media_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if kind != "video":
                continue
            if payload[:4] != _MAGIC:
                raise ValueError("unrecognized media payload")
            n_frames = int.from_bytes(payload[9:11], "big")
            body = payload[_HDR:]
            chunk = max(1, len(body) // max(1, n_frames))
            for f in range(0, n_frames, self.every_n):
                ids.append(mid)
                fidx.append(f)
                ts.append(int(f * 1000.0 / self.fps))
                frames.append(body[f * chunk : (f + 1) * chunk])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "ts_ms": pa.array(ts, pa.int64()),
                "frame_bytes": pa.array(frames, pa.binary()),
            }
        )


def sample_frames(ds, every_n: int = 4, fps: float = 10.0,
                  concurrency=(1, 4), batch_size: int = 32):
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"every_n": every_n, "fps": fps},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
