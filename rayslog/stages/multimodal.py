"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The image/audio decode libraries are not available in this container, so
the decode kernels are STUBS — ``RealDecoder`` raises
NotImplementedError where PIL/ffmpeg would run, and ``FakeDecoder``
produces deterministic byte-level features so the Ray-side plumbing
(binary schema, actor-pool signature, batch sizing for large payloads,
output layout) is real and tested end-to-end.

Scale notes baked into the design: payload batches are SMALL
(``MEDIA_BATCH_SIZE``) because batch bytes ≈ batch_size x payload size
must fit the worker heap next to the decoded output; the decoded
features are fixed-width columns so downstream stages are columnar
again.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

#: decode batches: 256 payloads x ~1 MB ≈ 256 MB worst-case per batch —
#: size DOWN for real media; the synthetic payloads here are ~1 KB.
MEDIA_BATCH_SIZE = 256

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("kind", pa.string()),        # image / audio / video
        pa.field("payload", pa.binary()),     # opaque encoded bytes
        pa.field("width", pa.int32()),        # typed metadata
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),
    ]
)


def synthesize_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus (binary payloads + metadata)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    payloads = [
        hashlib.blake2b(f"media-{i}".encode(), digest_size=32).digest()
        * int(rng.integers(8, 40))
        for i in range(n)
    ]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(kinds.tolist(), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(rng.integers(64, 4096, n).astype(np.int32)),
            "height": pa.array(rng.integers(64, 4096, n).astype(np.int32)),
            "duration_ms": pa.array(
                rng.integers(0, 600_000, n).astype(np.int32)
            ),
        }
    )


class RealDecoder:
    """The production decode stage — STUB.

    ``__init__`` is where codecs/models would load once per actor; the
    container has no media libraries, so ``__call__`` raises.
    """

    def __init__(self, target_size: tuple[int, int] = (224, 224)):
        self.target_size = target_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "image/audio decode libraries are not available in this "
            "container; use FakeDecoder for plumbing tests"
        )


class FakeDecoder:
    """Deterministic stand-in decoder: byte-histogram 'features'.

    Mirrors the real stage's shape exactly: stateful init, binary in,
    fixed-width feature vector + scalar stats out.
    """

    def __init__(self, n_features: int = 16):
        self.n_features = n_features

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload")
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        feats, sizes = [], []
        for p in payloads.to_pylist():
            b = np.frombuffer(p or b"", dtype=np.uint8)
            sizes.append(len(b))
            if len(b) == 0:
                feats.append(np.zeros(self.n_features, dtype=np.float32))
                continue
            hist = np.bincount(b % self.n_features, minlength=self.n_features)
            feats.append((hist / len(b)).astype(np.float32))
        return (
            batch.drop_columns(["payload"])
            .append_column("payload_bytes", pa.array(sizes, pa.int64()))
            .append_column(
                "features",
                pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
            )
        )


def decode_media(ds, decoder_cls=FakeDecoder, concurrency=(1, 8)):
    """Actor-pool decode stage over a media dataset."""
    return ds.map_batches(
        decoder_cls,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        zero_copy_batch=True,
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# REAL decode for stdlib-decodable containers (no external codecs needed):
# 24-bit BMP images (hand-parsed header + numpy pixel rows) and 16-bit PCM
# WAV audio (wave module).  Compressed codecs (JPEG/MP3/H.264) remain the
# RealDecoder stub above — those genuinely need libraries this container
# lacks.  The synthesize/decode pair exercises the FULL multimodal path:
# encode -> binary column -> actor-pool decode -> resize/frame-sample ->
# fixed-width features.
# ---------------------------------------------------------------------------

def _encode_bmp(pixels: np.ndarray) -> bytes:
    """Minimal 24-bit bottom-up BMP (BITMAPINFOHEADER)."""
    import struct

    h, w, _ = pixels.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    body_size = (row + pad) * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + body_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, body_size, 2835, 2835, 0, 0
    )
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        bgr = pixels[y, :, ::-1].astype(np.uint8).tobytes()
        rows.append(bgr + b"\x00" * pad)
    return header + b"".join(rows)


def _decode_bmp(data: bytes) -> np.ndarray:
    """Parse a 24-bit BMP back to (h, w, 3) RGB uint8."""
    import struct

    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", data, 10)[0]
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    if bpp != 24:
        raise ValueError("only 24-bit BMP supported")
    row = w * 3
    pad = (4 - row % 4) % 4
    out = np.empty((h, w, 3), dtype=np.uint8)
    stride = row + pad
    buf = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=off)
    rows = buf.reshape(h, stride)[:, :row].reshape(h, w, 3)
    out[:] = rows[::-1, :, ::-1]  # bottom-up BGR -> top-down RGB
    return out


def _encode_wav(samples: np.ndarray, rate: int = 8_000) -> bytes:
    """16-bit mono PCM WAV via the stdlib wave module."""
    import io
    import wave

    bio = io.BytesIO()
    with wave.open(bio, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return bio.getvalue()


def _decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as wf:
        rate = wf.getframerate()
        raw = wf.readframes(wf.getnframes())
    return np.frombuffer(raw, dtype="<i2").astype(np.float64), rate


def synthesize_real_media_table(n: int, seed: int = 42) -> pa.Table:
    """REAL encoded payloads: deterministic BMP gradients and WAV tones."""
    rng = np.random.default_rng(seed)
    ids, kinds, payloads, widths, heights, durs = [], [], [], [], [], []
    for i in range(n):
        if i % 2 == 0:
            w = int(rng.integers(8, 33))
            h = int(rng.integers(8, 33))
            yy, xx = np.mgrid[0:h, 0:w]
            px = np.stack(
                [
                    (xx * 255 // max(w - 1, 1)),
                    (yy * 255 // max(h - 1, 1)),
                    np.full((h, w), int(rng.integers(0, 256))),
                ],
                axis=-1,
            ).astype(np.uint8)
            payloads.append(_encode_bmp(px))
            kinds.append("image")
            widths.append(w)
            heights.append(h)
            durs.append(0)
        else:
            ms = int(rng.integers(50, 400))
            n_samp = 8_000 * ms // 1_000
            freq = float(rng.integers(100, 1_000))
            t = np.arange(n_samp) / 8_000.0
            samples = (np.sin(2 * np.pi * freq * t) * 12_000).astype(np.int16)
            payloads.append(_encode_wav(samples))
            kinds.append("audio")
            widths.append(0)
            heights.append(0)
            durs.append(ms)
        ids.append(i)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "duration_ms": pa.array(durs, pa.int32()),
        }
    )


class StdlibDecoder:
    """REAL decode + feature extraction for BMP images and WAV audio.

    Images: decode pixels, 4x4 mean-pooled luma thumbnail (the resize
    step) -> 16 features.  Audio: decode PCM, 16-segment RMS profile
    (the frame-sample step) -> 16 features.  Outputs decoded_w/
    decoded_h/decoded_ms so tests can assert decode correctness against
    the synthesis metadata.
    """

    def __init__(self, n_features: int = 16):
        self.n_features = n_features

    def _image_features(self, data: bytes):
        px = _decode_bmp(data)
        h, w, _ = px.shape
        luma = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
        # 4x4 mean-pool resize (pad-free: index buckets)
        ys = (np.arange(h) * 4 // max(h, 1)).clip(0, 3)
        xs = (np.arange(w) * 4 // max(w, 1)).clip(0, 3)
        thumb = np.zeros((4, 4))
        cnt = np.zeros((4, 4))
        np.add.at(thumb, (ys[:, None], xs[None, :]), luma)
        np.add.at(cnt, (ys[:, None], xs[None, :]), 1.0)
        thumb = thumb / np.maximum(cnt, 1.0) / 255.0
        return w, h, 0, thumb.reshape(-1).astype(np.float32)

    def _audio_features(self, data: bytes):
        samples, rate = _decode_wav(data)
        ms = int(round(len(samples) * 1_000 / rate))
        segs = np.array_split(samples, self.n_features)
        rms = np.array(
            [np.sqrt(np.mean(s * s)) / 32_768.0 if len(s) else 0.0 for s in segs]
        )
        return 0, 0, ms, rms.astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload")
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        kinds = batch.column("kind").to_pylist()
        dw, dh, dms, feats, sizes = [], [], [], [], []
        for kind, p in zip(kinds, payloads.to_pylist()):
            sizes.append(len(p or b""))
            if kind == "image":
                w, h, ms, f = self._image_features(p)
            elif kind == "audio":
                w, h, ms, f = self._audio_features(p)
            else:  # compressed/video -> no stdlib codec; null features
                w = h = ms = 0
                f = np.zeros(self.n_features, dtype=np.float32)
            dw.append(w)
            dh.append(h)
            dms.append(ms)
            feats.append(f)
        return (
            batch.drop_columns(["payload"])
            .append_column("payload_bytes", pa.array(sizes, pa.int64()))
            .append_column("decoded_w", pa.array(dw, pa.int32()))
            .append_column("decoded_h", pa.array(dh, pa.int32()))
            .append_column("decoded_ms", pa.array(dms, pa.int32()))
            .append_column(
                "features",
                pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
            )
        )
