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
