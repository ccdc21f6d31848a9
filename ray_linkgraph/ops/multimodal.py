"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real, dependency-free image codecs are implemented for BMP (24/32-bit
uncompressed) and PPM/PGM (P6/P5 binary) — both are trivial formats a
few dozen lines of numpy decode exactly; ``codec="image"`` sniffs the
magic bytes and produces per-image pixel statistics as the feature
vector, plus a vectorized nearest-neighbor resize stage. Formats that
genuinely need external libraries (JPEG/PNG/audio) raise
NotImplementedError naming the dependency; ``codec="fake"`` remains the
deterministic stand-in for plumbing tests.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from .._util import hash_u64


# ---------------------------------------------------------------------------
# real codecs: BMP (24/32-bit uncompressed) + PPM/PGM (binary)
# ---------------------------------------------------------------------------

def encode_bmp(arr: np.ndarray) -> bytes:
    """uint8 (H, W, 3) RGB -> 24-bit uncompressed bottom-up BMP."""
    h, w, _ = arr.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    rows = arr[::-1, :, ::-1]                     # flip vertical, RGB->BGR
    buf = np.zeros((h, row_size), dtype=np.uint8)
    buf[:, :w * 3] = rows.reshape(h, w * 3)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    return header + info + buf.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24/32-bit uncompressed BMP -> uint8 (H, W, 3) RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    _, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"only uncompressed 24/32-bit BMP supported (bpp={bpp}, "
            f"compression={comp})")
    bottom_up = h > 0
    h = abs(h)
    nb = bpp // 8
    row_size = (w * nb + 3) & ~3
    data = np.frombuffer(payload, np.uint8, count=row_size * h,
                         offset=off).reshape(h, row_size)
    px = data[:, :w * nb].reshape(h, w, nb)[:, :, :3][:, :, ::-1]
    if bottom_up:
        px = px[::-1]
    return np.ascontiguousarray(px)


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5), maxval <= 255 -> uint8 (H, W, 3)."""
    magic = payload[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    # header tokens: magic, width, height, maxval ('#' comments allowed)
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while payload[pos:pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1                                       # single ws after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    ch = 3 if magic == b"P6" else 1
    px = np.frombuffer(payload, np.uint8, count=w * h * ch,
                       offset=pos).reshape(h, w, ch)
    if ch == 1:
        px = np.repeat(px, 3, axis=2)
    return np.ascontiguousarray(px)


def decode_image(payload: bytes) -> np.ndarray:
    """Sniff the magic bytes and decode (BMP / PPM / PGM)."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] in (b"P6", b"P5"):
        return decode_ppm(payload)
    if payload[:3] == b"\xff\xd8\xff":
        raise NotImplementedError("JPEG decoding requires Pillow "
                                  "(not installed)")
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        raise NotImplementedError("PNG decoding requires Pillow "
                                  "(not installed)")
    raise ValueError("unrecognized image payload")


# ---------------------------------------------------------------------------
# real audio codec: WAV (RIFF, 16-bit PCM)
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 samples (n,) or (n, ch) -> canonical RIFF/WAVE (16-bit PCM,
    single fmt + data chunk layout; data at byte offset 44)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = np.ascontiguousarray(samples.astype("<i2")).tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, sample_rate,
                                   sample_rate * ch * 2, ch * 2, 16)
           + b"data" + struct.pack("<I", len(data)))
    return hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE 16-bit PCM -> (int16 samples (n, ch), sample_rate).
    Walks the chunk list, so extra chunks (LIST/INFO...) are fine."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        sz = struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"fmt ":
            fmt = payload[pos + 8:pos + 8 + sz]
        elif cid == b"data":
            data = payload[pos + 8:pos + 8 + sz]
        pos += 8 + sz + (sz & 1)                     # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, ch, sr, _, _, bps = struct.unpack_from("<HHIIHH", fmt, 0)
    if audio_fmt != 1 or bps != 16:
        raise NotImplementedError(
            f"only 16-bit PCM WAV supported (fmt={audio_fmt}, bits={bps}); "
            f"compressed audio would require soundfile/librosa")
    samples = np.frombuffer(data, dtype="<i2")
    return samples.reshape(-1, ch), int(sr)


def audio_features(samples: np.ndarray, sr: int,
                   feat_dim: int = 8) -> np.ndarray:
    """Deterministic per-clip statistics: n_samples, rate, mean, rms,
    peak, zero-crossing count (channel 0), min, max."""
    x = samples.astype(np.float64)
    c0 = x[:, 0]
    f = np.array([samples.shape[0], sr, x.mean(),
                  np.sqrt((x * x).mean()), np.abs(x).max(),
                  float((np.signbit(c0[1:]) != np.signbit(c0[:-1])).sum()),
                  x.min(), x.max()], dtype=np.float32)
    if feat_dim <= len(f):
        return f[:feat_dim]
    return np.r_[f, np.zeros(feat_dim - len(f), dtype=np.float32)]


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Sniff the magic bytes and decode (WAV only; compressed formats
    name their missing dependency)."""
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    if payload[:3] == b"ID3" or payload[:2] in (b"\xff\xfb", b"\xff\xf3"):
        raise NotImplementedError("MP3 decoding requires librosa/ffmpeg "
                                  "(not installed)")
    if payload[:4] == b"fLaC":
        raise NotImplementedError("FLAC decoding requires soundfile "
                                  "(not installed)")
    raise ValueError("unrecognized audio payload")


def resize_nearest(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Vectorized nearest-neighbor resize of an (H, W, C) array."""
    h, w = px.shape[:2]
    yi = (np.arange(out_h) * h) // out_h
    xi = (np.arange(out_w) * w) // out_w
    return np.ascontiguousarray(px[yi[:, None], xi[None, :]])


def image_features(px: np.ndarray, feat_dim: int = 8) -> np.ndarray:
    """Deterministic per-image statistics feature vector: dims, per-
    channel means, global std / min / max (padded/truncated to
    feat_dim)."""
    f = np.array([px.shape[1], px.shape[0],
                  px[:, :, 0].mean(), px[:, :, 1].mean(),
                  px[:, :, 2].mean(), px.std(),
                  float(px.min()), float(px.max())], dtype=np.float32)
    if feat_dim <= len(f):
        return f[:feat_dim]
    return np.r_[f, np.zeros(feat_dim - len(f), dtype=np.float32)]

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("payload", pa.binary()),
    ("media_type", pa.string()),      # "image" | "audio" | "video"
    ("byte_size", pa.int64()),
])


def synthetic_media_table(n: int, seed: int = 42,
                          media_type: str = "image") -> pa.Table:
    """Deterministic binary payloads for tests/gates. ``media_type``:
    "image" -> opaque hash bytes (plumbing tests with codec="fake");
    "bmp" -> REAL decodable 24-bit BMPs (deterministic hash-gradient
    pixels, varied dimensions);
    "wav" -> REAL decodable 16-bit PCM WAVs (deterministic mono
    sawtooth, varied length / rate / period)."""
    ids = np.arange(n, dtype=np.int64)
    payloads, sizes = [], []
    if media_type == "wav":
        hs = hash_u64(np.uint64(seed), ids.astype(np.uint64))
        rates = (8000, 16000, 22050)
        for i in range(n):
            sr = rates[int(hs[i] % np.uint64(3))]
            ns = int(500 + (hs[i] >> np.uint64(8)) % np.uint64(1500))
            period = int(16 + (hs[i] >> np.uint64(24)) % np.uint64(240))
            samples = ((np.arange(ns, dtype=np.int64) % period)
                       * 200 - period * 100).astype(np.int16)
            payloads.append(encode_wav(samples, sr))
            sizes.append(len(payloads[-1]))
    elif media_type == "bmp":
        hs = hash_u64(np.uint64(seed), ids.astype(np.uint64))
        for i in range(n):
            w = int(16 + hs[i] % np.uint64(33))
            h = int(16 + (hs[i] >> np.uint64(8)) % np.uint64(29))
            yy, xx = np.mgrid[0:h, 0:w]
            r = ((xx * 255) // max(w - 1, 1)).astype(np.uint8)
            gch = ((yy * 255) // max(h - 1, 1)).astype(np.uint8)
            b = (hash_u64(np.uint64(seed), np.uint64(i),
                          (yy * w + xx).astype(np.uint64).ravel())
                 % np.uint64(256)).astype(np.uint8).reshape(h, w)
            payloads.append(encode_bmp(np.stack([r, gch, b], axis=2)))
            sizes.append(len(payloads[-1]))
    else:
        szs = 64 + (hash_u64(np.uint64(seed), ids.astype(np.uint64))
                    % np.uint64(192)).astype(np.int64)
        for i, s in zip(ids, szs):
            u = hash_u64(np.uint64(seed), np.uint64(i),
                         np.arange((s + 7) // 8, dtype=np.uint64))
            payloads.append(u.tobytes()[:s])
        sizes = szs.tolist()
    return pa.table({
        "media_id": pa.array(ids),
        "payload": pa.array(payloads, type=pa.binary()),
        "media_type": pa.array([media_type] * n),
        "byte_size": pa.array(np.asarray(sizes, dtype=np.int64)),
    })


class MediaDecoder:
    """Actor-pool stage: payload -> (dims, feature vector).

    ``codec="fake"`` is a deterministic stand-in (dims and features are
    hashes of the payload bytes); real codecs raise NotImplementedError
    with the dependency that would provide them — the Ray-side wiring is
    identical either way.
    """

    #: per-codec (dim column names, channel-sum column names)
    _COLS = {
        "image": (("width", "height"), ("sum_r", "sum_g", "sum_b")),
        "fake": (("width", "height"), ("sum_r", "sum_g", "sum_b")),
        "audio": (("n_samples", "sample_rate"),
                  ("sum_ch0", "sum_ch1", "sum_ch2")),
    }

    def __init__(self, codec: str = "fake", feat_dim: int = 8,
                 resize_to: tuple[int, int] | None = None,
                 channel_sums: bool = False, decoder_hook=None):
        """``decoder_hook``: optional user callable for formats the
        built-in dependency-free codecs can't read (JPEG/PNG for
        ``codec="image"`` — must return a uint8 (H, W, 3) array;
        MP3/FLAC for ``codec="audio"`` — must return (int16 samples
        (n, ch), sample_rate)). It is only consulted AFTER the built-in
        sniffers decline (NotImplementedError/ValueError), so e.g. a
        Pillow- or soundfile-backed hook plugs in external libraries
        without this module vendoring them; without a hook the original
        NotImplementedError naming the missing dependency propagates."""
        self.feat_dim = feat_dim
        self.resize_to = resize_to
        self.channel_sums = channel_sums
        self.decoder_hook = decoder_hook
        if codec == "fake":
            self.decode = self._decode_fake
        elif codec == "image":
            self.decode = self._decode_image   # real BMP/PPM/PGM decode
        elif codec == "audio":
            self.decode = self._decode_audio   # real WAV 16-bit PCM decode
        else:
            raise ValueError(f"unknown codec {codec!r}")
        self.dim_cols, self.sum_cols = self._COLS[codec]

    def _decode_image(self, payload: bytes):
        try:
            px = decode_image(payload)
        except (NotImplementedError, ValueError):
            if self.decoder_hook is None:
                raise
            px = np.ascontiguousarray(
                np.asarray(self.decoder_hook(payload), dtype=np.uint8))
        if self.resize_to is not None:
            px = resize_nearest(px, *self.resize_to)
        # exact integer channel sums from the DECODED pixels —
        # SQL-checkable against the payload (entries.py media oracle),
        # unlike the float32 means in `features`
        sums = ([int(px[:, :, c].sum(dtype=np.int64)) for c in range(3)]
                if self.channel_sums else None)
        return (px.shape[1], px.shape[0],
                image_features(px, self.feat_dim), sums)

    def _decode_audio(self, payload: bytes):
        try:
            samples, sr = decode_audio(payload)
        except (NotImplementedError, ValueError):
            if self.decoder_hook is None:
                raise
            samples, sr = self.decoder_hook(payload)
            samples = np.asarray(samples, dtype=np.int16)
            if samples.ndim == 1:
                samples = samples[:, None]
        sums = None
        if self.channel_sums:
            sums = [int(samples[:, c].sum(dtype=np.int64))
                    if c < samples.shape[1] else 0 for c in range(3)]
        return (samples.shape[0], sr,
                audio_features(samples, sr, self.feat_dim), sums)

    def _decode_fake(self, payload: bytes):
        u = np.frombuffer(payload[:8].ljust(8, b"\0"), dtype=np.uint64)
        h = hash_u64(u, np.arange(self.feat_dim + 2, dtype=np.uint64))
        w = int(16 + h[0] % np.uint64(112))
        hgt = int(16 + h[1] % np.uint64(112))
        feats = ((h[2:] >> np.uint64(11)).astype(np.float32)
                 / np.float32(1 << 53))
        return w, hgt, feats, [0, 0, 0] if self.channel_sums else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id")
        ws, hs, fs = [], [], []
        sums = [[], [], []] if self.channel_sums else None
        for payload in batch.column("payload").to_pylist():
            w, h, f, s3 = self.decode(payload)
            ws.append(w)
            hs.append(h)
            fs.append(f)
            if sums is not None:
                for c in range(3):
                    sums[c].append(s3[c])
        out = {
            "media_id": ids,
            self.dim_cols[0]: pa.array(ws, type=pa.int64()),
            self.dim_cols[1]: pa.array(hs, type=pa.int64()),
            "features": pa.array([f.tolist() for f in fs],
                                 type=pa.list_(pa.float32())),
        }
        if "byte_size" in batch.column_names:
            out["byte_size"] = batch.column("byte_size")
        if sums is not None:
            for c, name in enumerate(self.sum_cols):
                out[name] = pa.array(sums[c], type=pa.int64())
        return pa.table(out)


def decode_media(media_ds, codec: str = "fake", batch_size: int = 64,
                 concurrency=(1, 4), feat_dim: int = 8,
                 channel_sums: bool = False, decoder_hook=None):
    """Small batch_size on purpose: wide binary rows — batch x
    concurrency must fit the worker heap (SURVEY.md memory notes).
    ``decoder_hook`` plugs an external-library codec in for formats the
    built-ins decline (see MediaDecoder). Runs as a warm TASK pool (the
    decoder state is a handful of scalars + the hook callable — nothing
    to amortize in an actor __init__, and actor pools ship constructor
    blobs through the object store, the ray#53727 restart hazard)."""
    from ..extract import _task_cap
    dec = MediaDecoder(codec=codec, feat_dim=feat_dim,
                       channel_sums=channel_sums,
                       decoder_hook=decoder_hook)
    return media_ds.map_batches(
        dec, batch_format="pyarrow", batch_size=batch_size,
        concurrency=_task_cap(concurrency))


def frame_sample_indices(n_frames: int, every_k: int = 10) -> np.ndarray:
    """Deterministic frame-sampling plan for video payloads (stub of the
    decode step; the sampling arithmetic is the real, tested part)."""
    return np.arange(0, n_frames, every_k, dtype=np.int64)
