"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The decode codecs themselves are STUBBED (no image/audio libraries in
this environment — decode raises NotImplementedError unless the
deterministic fake codec is selected), but everything Ray-side is real
and tested: the schema contract, the actor-pool stage shape (codec
"loaded" once per actor in __init__), batch sizing for wide binary rows,
and the output layout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .._util import hash_u64

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("payload", pa.binary()),
    ("media_type", pa.string()),      # "image" | "audio" | "video"
    ("byte_size", pa.int64()),
])


def synthetic_media_table(n: int, seed: int = 42,
                          media_type: str = "image") -> pa.Table:
    """Deterministic fake binary payloads for plumbing tests."""
    ids = np.arange(n, dtype=np.int64)
    sizes = 64 + (hash_u64(np.uint64(seed), ids.astype(np.uint64))
                  % np.uint64(192)).astype(np.int64)
    payloads = []
    for i, s in zip(ids, sizes):
        u = hash_u64(np.uint64(seed), np.uint64(i),
                     np.arange((s + 7) // 8, dtype=np.uint64))
        payloads.append(u.tobytes()[:s])
    return pa.table({
        "media_id": pa.array(ids),
        "payload": pa.array(payloads, type=pa.binary()),
        "media_type": pa.array([media_type] * n),
        "byte_size": pa.array(sizes),
    })


class MediaDecoder:
    """Actor-pool stage: payload -> (dims, feature vector).

    ``codec="fake"`` is a deterministic stand-in (dims and features are
    hashes of the payload bytes); real codecs raise NotImplementedError
    with the dependency that would provide them — the Ray-side wiring is
    identical either way.
    """

    def __init__(self, codec: str = "fake", feat_dim: int = 8):
        self.feat_dim = feat_dim
        if codec == "fake":
            self.decode = self._decode_fake
        elif codec == "image":
            try:
                import PIL.Image  # noqa: F401  (not in this environment)
                raise NotImplementedError(
                    "real image decode path not implemented; use codec='fake'")
            except ImportError:
                raise NotImplementedError(
                    "image decoding requires Pillow, which is not installed; "
                    "use codec='fake' for the deterministic stand-in")
        elif codec == "audio":
            raise NotImplementedError(
                "audio decoding requires soundfile/librosa (not installed); "
                "use codec='fake'")
        else:
            raise ValueError(f"unknown codec {codec!r}")

    def _decode_fake(self, payload: bytes):
        u = np.frombuffer(payload[:8].ljust(8, b"\0"), dtype=np.uint64)
        h = hash_u64(u, np.arange(self.feat_dim + 2, dtype=np.uint64))
        w = int(16 + h[0] % np.uint64(112))
        hgt = int(16 + h[1] % np.uint64(112))
        feats = ((h[2:] >> np.uint64(11)).astype(np.float32)
                 / np.float32(1 << 53))
        return w, hgt, feats

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id")
        ws, hs, fs = [], [], []
        for payload in batch.column("payload").to_pylist():
            w, h, f = self.decode(payload)
            ws.append(w)
            hs.append(h)
            fs.append(f)
        return pa.table({
            "media_id": ids,
            "width": pa.array(ws, type=pa.int64()),
            "height": pa.array(hs, type=pa.int64()),
            "features": pa.array([f.tolist() for f in fs],
                                 type=pa.list_(pa.float32())),
        })


def decode_media(media_ds, codec: str = "fake", batch_size: int = 64,
                 concurrency=(1, 4), feat_dim: int = 8):
    """Small batch_size on purpose: wide binary rows — batch x
    concurrency must fit the worker heap (SURVEY.md memory notes)."""
    return media_ds.map_batches(
        MediaDecoder, fn_constructor_kwargs={"codec": codec,
                                             "feat_dim": feat_dim},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def frame_sample_indices(n_frames: int, every_k: int = 10) -> np.ndarray:
    """Deterministic frame-sampling plan for video payloads (stub of the
    decode step; the sampling arithmetic is the real, tested part)."""
    return np.arange(0, n_frames, every_k, dtype=np.int64)
