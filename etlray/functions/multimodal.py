"""Multimodal column stages — image/audio/video as opaque ``binary``
columns with typed metadata.

The decode libraries (PIL / torchaudio / ffmpeg) are NOT in this
container, so the decode kernels are STUBBED: each stage checks for
the real library in ``__init__`` (once per actor) and otherwise uses a
clearly-marked deterministic fake (features derived from a blake2b of
the payload) or raises ``NotImplementedError`` when
``strict=True``. The Ray-side plumbing — schema, actor-pool
signature, batch sizing, output layout — is real and tested.

Batch-size guidance: binary payloads are large; pass a SMALL
``batch_size`` (e.g. 32-256) so batch × concurrency fits worker heap
(ray_guide: memory-aware batching for wide binary rows).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

IMAGE_SCHEMA = pa.schema([
    pa.field("media_id", pa.int64()),
    pa.field("payload", pa.binary()),
    pa.field("mime", pa.string()),
    pa.field("width", pa.int32()),
    pa.field("height", pa.int32()),
])


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in feature vector: blake2b-seeded uniform."""
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "little")
    return np.random.default_rng(seed).random(dim, dtype=np.float32)


class ImageDecodeStage:
    """Actor-pool stage: payload bytes → (width, height, decoded ok).

    Real path (PIL available): decodes per batch. Stub path: parses
    nothing, emits deterministic fake dims; ``strict=True`` raises
    NotImplementedError instead (so pipelines fail loudly when a real
    decode was expected)."""

    def __init__(self, payload_col: str = "payload", strict: bool = False) -> None:
        self.payload_col = payload_col
        self.strict = strict
        try:  # once per actor — never per batch
            from PIL import Image  # noqa: F401

            self._pil = Image
        except ImportError:
            self._pil = None

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t[self.payload_col].to_pylist()
        if self._pil is not None:
            import io

            dims = []
            for p in payloads:
                try:
                    with self._pil.open(io.BytesIO(p)) as im:
                        dims.append(im.size)
                except Exception:
                    dims.append((None, None))
            w = [d[0] for d in dims]
            h = [d[1] for d in dims]
        else:
            if self.strict:
                raise NotImplementedError(
                    "image decode requires PIL, which is not installed; "
                    "run with strict=False for the deterministic stub")
            # STUB: deterministic fake dims from payload hash
            w, h = [], []
            for p in payloads:
                hsh = int.from_bytes(
                    hashlib.blake2b(p or b"", digest_size=4).digest(), "little")
                w.append(64 + hsh % 512)
                h.append(64 + (hsh >> 9) % 512)
        t = t.append_column("decoded_width", pa.array(w, type=pa.int32()))
        t = t.append_column("decoded_height", pa.array(h, type=pa.int32()))
        return t


class ImageFeatureStage:
    """payload bytes → fixed-size float32 feature vector. Real models
    would load in __init__ (once per actor); the stub emits
    deterministic hash-seeded vectors with the REAL output schema
    (list<float32> of ``dim``)."""

    def __init__(self, payload_col: str = "payload", dim: int = 64,
                 strict: bool = False) -> None:
        self.payload_col = payload_col
        self.dim = dim
        self.strict = strict
        self._model = None  # a real pipeline loads weights here

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.strict and self._model is None:
            raise NotImplementedError("no feature model available in this container")
        feats = [
            _fake_features(p or b"", self.dim).tolist()
            for p in t[self.payload_col].to_pylist()
        ]
        return t.append_column(
            "features", pa.array(feats, type=pa.list_(pa.float32())))


class FrameSampleStage:
    """Video payload → N sampled 'frames' (stub: slices of the payload
    re-emitted as one row per frame via a flat output table — the
    real layout a frame sampler produces)."""

    def __init__(self, payload_col: str = "payload", id_col: str = "media_id",
                 num_frames: int = 4) -> None:
        self.payload_col = payload_col
        self.id_col = id_col
        self.num_frames = num_frames

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, frames, idxs = [], [], []
        for mid, p in zip(t[self.id_col].to_pylist(),
                          t[self.payload_col].to_pylist()):
            p = p or b""
            step = max(len(p) // self.num_frames, 1)
            for fi in range(self.num_frames):
                ids.append(mid)
                idxs.append(fi)
                frames.append(p[fi * step:(fi + 1) * step])  # STUB slice
        return pa.table({
            self.id_col: pa.array(ids, type=pa.int64()),
            "frame_index": pa.array(idxs, type=pa.int32()),
            "frame_payload": pa.array(frames, type=pa.binary()),
        })


def synth_media_table(n: int = 64, seed: int = 3) -> pa.Table:
    """Deterministic fake media table for tests/demos (binary payloads
    of varying size + metadata) — matches IMAGE_SCHEMA."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(s), dtype=np.uint8).tobytes()
                for s in rng.integers(200, 4000, size=n)]
    return pa.table({
        "media_id": pa.array(range(n), type=pa.int64()),
        "payload": pa.array(payloads, type=pa.binary()),
        "mime": pa.array(["image/fake"] * n),
        "width": pa.array(rng.integers(64, 1024, size=n).astype("int32")),
        "height": pa.array(rng.integers(64, 1024, size=n).astype("int32")),
    })
