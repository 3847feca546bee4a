"""Multimodal column stages — image/audio/video as opaque ``binary``
columns with typed metadata.

Formats needing NO external library decode for real: uncompressed
24-bit BMP (pure numpy header parse + pixel reshape) and PCM WAV
(stdlib ``wave``) — so decode → feature-extract → resize run genuinely
end-to-end on self-contained fixtures. Formats that need PIL /
torchaudio / ffmpeg (absent in this container) fall back to a
clearly-marked deterministic stub (features derived from a blake2b of
the payload) or raise ``NotImplementedError`` when ``strict=True``.
The Ray-side plumbing — schema, actor-pool signature, batch sizing,
output layout — is identical on both paths.

Batch-size guidance: binary payloads are large; pass a SMALL
``batch_size`` (e.g. 32-256) so batch × concurrency fits worker heap
(ray_guide: memory-aware batching for wide binary rows).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa


# ---------------------------------------------------------------------------
# real, dependency-free codecs: 24-bit BMP + PCM WAV
# ---------------------------------------------------------------------------
def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → uncompressed 24-bit BMP bytes."""
    h, w, _ = pixels.shape
    row_bytes = (w * 3 + 3) & ~3
    img_size = row_bytes * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    bgr = pixels[::-1, :, ::-1]                 # bottom-up, BGR
    rows[:, :w * 3] = bgr.reshape(h, w * 3)
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray | None:
    """Uncompressed 24-bit BMP bytes → (h, w, 3) uint8 RGB; None when
    the payload isn't such a BMP."""
    if not payload or payload[:2] != b"BM" or len(payload) < 54:
        return None
    offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        return None
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return None
    flip = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    if len(payload) < offset + row_bytes * h:
        return None
    rows = np.frombuffer(payload, dtype=np.uint8,
                         count=row_bytes * h, offset=offset).reshape(h, row_bytes)
    bgr = rows[:, :w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return rgb[::-1] if flip else rgb


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import zlib

    return struct.pack(">I", len(data)) + tag + data + \
        struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB → PNG bytes (8-bit truecolor, no interlace),
    dependency-free: stdlib zlib deflate + numpy row filtering. All
    five PNG filter types are supported (encoding filters use RAW
    neighbor bytes, so every one vectorizes); real encoders pick a
    filter per row — a fixed ``filter_type`` is enough here and lets
    the round-trip tests exercise each decode path."""
    import zlib

    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, c = px.shape
    if c != 3:
        raise ValueError("encode_png expects (h, w, 3) RGB")
    raw = px.astype(np.int16)
    left = np.zeros_like(raw)
    left[:, 1:] = raw[:, :-1]
    up = np.zeros_like(raw)
    up[1:] = raw[:-1]
    upleft = np.zeros_like(raw)
    upleft[1:, 1:] = raw[:-1, :-1]
    if filter_type == 0:
        filt = raw
    elif filter_type == 1:
        filt = raw - left
    elif filter_type == 2:
        filt = raw - up
    elif filter_type == 3:
        filt = raw - (left + up) // 2
    elif filter_type == 4:
        p = left + up - upleft
        pl, pu, pul = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
        pred = np.where((pl <= pu) & (pl <= pul), left,
                        np.where(pu <= pul, up, upleft))
        filt = raw - pred
    else:
        raise ValueError("PNG filter type must be 0-4")
    scan = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    scan[:, 0] = filter_type
    scan[:, 1:] = (filt & 0xFF).astype(np.uint8).reshape(h, w * 3)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(scan.tobytes()))
            + _png_chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray | None:
    """PNG bytes → (h, w, 3) uint8 RGB, dependency-free: chunk walk,
    stdlib zlib inflate, numpy per-row unfiltering of all five filter
    types (Sub via a mod-256 cumulative sum; Average/Paeth carry a
    left-neighbor dependency, so those rows reconstruct pixel-wise with
    the 3 channels vectorized). Supports the subset this engine's own
    ``encode_png`` emits — 8-bit truecolor (color type 2), non
    interlaced — and returns None for anything else (grayscale,
    palette, alpha, 16-bit, interlaced, or non-PNG payloads), which
    sends the caller down the PIL-or-stub path."""
    import zlib

    if not payload or not payload.startswith(_PNG_SIG):
        return None
    pos = len(_PNG_SIG)
    w = h = None
    idat = bytearray()
    try:
        while pos + 8 <= len(payload):
            ln, tag = struct.unpack_from(">I4s", payload, pos)
            data = payload[pos + 8:pos + 8 + ln]
            pos += 12 + ln
            if tag == b"IHDR":
                w, h, depth, ctype, comp, filt_m, inter = \
                    struct.unpack(">IIBBBBB", data)
                if depth != 8 or ctype != 2 or comp != 0 or filt_m != 0 \
                        or inter != 0:
                    return None
            elif tag == b"IDAT":
                idat.extend(data)
            elif tag == b"IEND":
                break
        if w is None or not idat:
            return None
        scan = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    except Exception:
        return None
    stride = 1 + w * 3
    if len(scan) != h * stride:
        return None
    scan = scan.reshape(h, stride)
    ftypes = scan[:, 0]
    rows = scan[:, 1:].astype(np.int16)         # filtered bytes
    out = np.zeros((h, w, 3), dtype=np.int16)
    prev = np.zeros((w, 3), dtype=np.int16)
    for y in range(h):
        f = ftypes[y]
        cur = rows[y].reshape(w, 3)
        if f == 0:
            rec = cur
        elif f == 1:
            rec = np.cumsum(cur, axis=0, dtype=np.int64) % 256
        elif f == 2:
            rec = (cur + prev) % 256
        elif f in (3, 4):
            rec = np.zeros((w, 3), dtype=np.int16)
            left = np.zeros(3, dtype=np.int16)
            for x in range(w):
                up = prev[x]
                if f == 3:
                    pred = (left + up) // 2
                else:
                    ul = prev[x - 1] if x else np.zeros(3, dtype=np.int16)
                    p = left + up - ul
                    pl, pu, pul = np.abs(p - left), np.abs(p - up), \
                        np.abs(p - ul)
                    pred = np.where((pl <= pu) & (pl <= pul), left,
                                    np.where(pu <= pul, up, ul))
                left = (cur[x] + pred) % 256
                rec[x] = left
        else:
            return None
        prev = rec.astype(np.int16)
        out[y] = prev
    return out.astype(np.uint8)


def encode_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """int16 mono samples → PCM WAV bytes (stdlib wave)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int] | None:
    """PCM WAV bytes → (float32 mono samples in [-1, 1], sample rate);
    None when the payload isn't PCM WAV."""
    import io
    import wave

    if not payload or payload[:4] != b"RIFF":
        return None
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            rate = w.getframerate()
            n = w.getnframes()
            width = w.getsampwidth()
            ch = w.getnchannels()
            raw = w.readframes(n)
    except Exception:
        return None
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        return None
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, rate


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Vectorized nearest-neighbor resize of an (h, w, c) array."""
    h, w = img.shape[:2]
    yi = np.minimum((np.arange(out_h) * h // out_h), h - 1)
    xi = np.minimum((np.arange(out_w) * w // out_w), w - 1)
    return img[yi[:, None], xi[None, :]]

def decode_image(payload: bytes) -> np.ndarray | None:
    """Dependency-free image decode: 24-bit BMP, 8-bit truecolor PNG,
    then baseline JPEG (``etlray/functions/jpeg.py`` — sequential DCT
    SOF0, sampling factors ≤ 2×2). Returns (h, w, 3) uint8 RGB or
    None."""
    img = decode_bmp(payload)
    if img is not None:
        return img
    img = decode_png(payload)
    if img is not None:
        return img
    if len(payload) >= 2 and payload[0] == 0xFF and payload[1] == 0xD8:
        from etlray.functions.jpeg import decode_jpeg

        return decode_jpeg(payload)
    return None


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
        w: list = []
        h: list = []
        for p in payloads:
            # REAL path 1: uncompressed 24-bit BMP or truecolor PNG —
            # numpy + stdlib zlib, no deps
            img = decode_image(p or b"")
            if img is not None:
                h.append(img.shape[0])
                w.append(img.shape[1])
                continue
            # REAL path 2: PIL when available (not in this container)
            if self._pil is not None:
                import io

                try:
                    with self._pil.open(io.BytesIO(p)) as im:
                        w.append(im.size[0])
                        h.append(im.size[1])
                    continue
                except Exception:
                    if self.strict:
                        # strict must fail loudly even when PIL is
                        # installed — silently emitting null dims
                        # inverted the documented contract
                        raise NotImplementedError(
                            "payload failed to decode (PIL path, "
                            "strict=True)")
                    w.append(None)
                    h.append(None)
                    continue
            if self.strict:
                raise NotImplementedError(
                    "payload is not BMP/PNG/baseline-JPEG and PIL is "
                    "not installed; run with strict=False for the "
                    "deterministic stub")
            # STUB: deterministic fake dims from payload hash
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
        feats = []
        for p in t[self.payload_col].to_pylist():
            img = decode_image(p or b"")
            if img is not None:
                # REAL features: grayscale thumbnail of exactly `dim`
                # pixels, normalized to [0, 1]
                side = max(int(np.sqrt(self.dim)), 1)
                gray = img.mean(axis=2)
                thumb = resize_nearest(gray[:, :, None], side, side)[:, :, 0]
                v = np.zeros(self.dim, dtype=np.float32)
                flat = (thumb.ravel() / 255.0).astype(np.float32)
                v[:len(flat)] = flat[:self.dim]
                feats.append(v.tolist())
                continue
            if self.strict and self._model is None:
                raise NotImplementedError(
                    "payload is not BMP/PNG and no feature model is "
                    "available in this container")
            feats.append(_fake_features(p or b"", self.dim).tolist())
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


class ImageResizeStage:
    """Decoded-image resize: BMP/PNG/baseline-JPEG payloads are REALLY
    decoded, resized (vectorized nearest-neighbor) and re-encoded in
    their ORIGINAL container format; undecodable payloads pass through
    unchanged (``strict=True`` raises instead).
    Output columns: ``resized_payload``, ``resized_width/height``."""

    def __init__(self, payload_col: str = "payload", out_w: int = 32,
                 out_h: int = 32, strict: bool = False) -> None:
        self.payload_col = payload_col
        self.out_w = out_w
        self.out_h = out_h
        self.strict = strict

    def __call__(self, t: pa.Table) -> pa.Table:
        outs, ws, hs = [], [], []
        for p in t[self.payload_col].to_pylist():
            p = p or b""
            img = decode_image(p)
            if img is None:
                if self.strict:
                    raise NotImplementedError(
                        "payload is not a 24-bit BMP, truecolor PNG or "
                        "baseline JPEG")
                outs.append(p)
                ws.append(None)
                hs.append(None)
                continue
            resized = resize_nearest(img, self.out_h, self.out_w)
            # re-encode in the ORIGINAL container: the old binary
            # png-vs-bmp flag silently turned decoded JPEGs into
            # uncompressed BMPs (~10-50x size inflation, wrong mime)
            if p.startswith(_PNG_SIG):
                enc = encode_png
            elif len(p) >= 2 and p[0] == 0xFF and p[1] == 0xD8:
                from etlray.functions.jpeg import encode_jpeg as enc
            else:
                enc = encode_bmp
            outs.append(enc(np.ascontiguousarray(resized)))
            ws.append(self.out_w)
            hs.append(self.out_h)
        t = t.append_column("resized_payload", pa.array(outs, type=pa.binary()))
        t = t.append_column("resized_width", pa.array(ws, type=pa.int32()))
        return t.append_column("resized_height", pa.array(hs, type=pa.int32()))


class AudioFeatureStage:
    """PCM-WAV payloads → REAL per-clip features (numpy only):
    duration_sec, rms, zero-crossing rate, spectral centroid (rFFT).
    Non-WAV payloads: hash-seeded stub (or strict raise)."""

    def __init__(self, payload_col: str = "payload", strict: bool = False) -> None:
        self.payload_col = payload_col
        self.strict = strict

    def __call__(self, t: pa.Table) -> pa.Table:
        dur, rms, zcr, cent = [], [], [], []
        for p in t[self.payload_col].to_pylist():
            decoded = decode_wav(p or b"")
            if decoded is None:
                if self.strict:
                    raise NotImplementedError("payload is not PCM WAV")
                hsh = int.from_bytes(
                    hashlib.blake2b(p or b"", digest_size=8).digest(), "little")
                r = np.random.default_rng(hsh)
                dur.append(float(r.random()))
                rms.append(float(r.random()))
                zcr.append(float(r.random()))
                cent.append(float(r.random() * 4000))
                continue
            x, rate = decoded
            # a zero-frame WAV has duration 0.0 — the old max(len,1)
            # fabricated 1/rate seconds for empty clips
            dur.append(len(x) / rate)
            rms.append(float(np.sqrt(np.mean(x * x))) if len(x) else 0.0)
            zcr.append(float(np.mean(np.abs(np.diff(np.signbit(x.astype(np.float64)))))) if len(x) > 1 else 0.0)
            if len(x) > 1:
                spec = np.abs(np.fft.rfft(x))
                freqs = np.fft.rfftfreq(len(x), d=1.0 / rate)
                tot = spec.sum()
                cent.append(float((freqs * spec).sum() / tot) if tot > 0 else 0.0)
            else:
                cent.append(0.0)
        for name, vals in [("duration_sec", dur), ("rms", rms),
                           ("zcr", zcr), ("spectral_centroid", cent)]:
            t = t.append_column(name, pa.array(vals, type=pa.float64()))
        return t


def synth_bmp_table(n: int = 32, seed: int = 3,
                    max_side: int = 48) -> pa.Table:
    """Deterministic REAL-BMP media table: every payload is a valid
    uncompressed 24-bit BMP the decode/resize/feature stages process
    for real — matches IMAGE_SCHEMA."""
    rng = np.random.default_rng(seed)
    payloads, ws, hs = [], [], []
    for _ in range(n):
        h = int(rng.integers(8, max_side))
        w = int(rng.integers(8, max_side))
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        payloads.append(encode_bmp(img))
        ws.append(w)
        hs.append(h)
    return pa.table({
        "media_id": pa.array(range(n), type=pa.int64()),
        "payload": pa.array(payloads, type=pa.binary()),
        "mime": pa.array(["image/bmp"] * n),
        "width": pa.array(ws, type=pa.int32()),
        "height": pa.array(hs, type=pa.int32()),
    })


def synth_png_table(n: int = 32, seed: int = 6,
                    max_side: int = 48) -> pa.Table:
    """Deterministic REAL-PNG media table: every payload is a valid
    8-bit truecolor PNG (filter type cycling 0-4, so the decode path
    exercises every unfilter kernel) — matches IMAGE_SCHEMA."""
    rng = np.random.default_rng(seed)
    payloads, ws, hs = [], [], []
    for i in range(n):
        h = int(rng.integers(8, max_side))
        w = int(rng.integers(8, max_side))
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        payloads.append(encode_png(img, filter_type=i % 5))
        ws.append(w)
        hs.append(h)
    return pa.table({
        "media_id": pa.array(range(n), type=pa.int64()),
        "payload": pa.array(payloads, type=pa.binary()),
        "mime": pa.array(["image/png"] * n),
        "width": pa.array(ws, type=pa.int32()),
        "height": pa.array(hs, type=pa.int32()),
    })


def synth_jpeg_table(n: int = 32, seed: int = 9,
                     max_side: int = 48) -> pa.Table:
    """Deterministic REAL-JPEG media table: every payload is a valid
    baseline JPEG (alternating 4:4:4 / 4:2:0 so the decode path
    exercises both the flat and the subsampled MCU layouts) — matches
    IMAGE_SCHEMA."""
    from etlray.functions.jpeg import encode_jpeg

    rng = np.random.default_rng(seed)
    payloads, ws, hs = [], [], []
    for i in range(n):
        h = int(rng.integers(8, max_side))
        w = int(rng.integers(8, max_side))
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        payloads.append(encode_jpeg(
            img, subsampling="4:2:0" if i % 2 else "4:4:4"))
        ws.append(w)
        hs.append(h)
    return pa.table({
        "media_id": pa.array(range(n), type=pa.int64()),
        "payload": pa.array(payloads, type=pa.binary()),
        "mime": pa.array(["image/jpeg"] * n),
        "width": pa.array(ws, type=pa.int32()),
        "height": pa.array(hs, type=pa.int32()),
    })


def synth_wav_table(n: int = 16, seed: int = 4, rate: int = 8_000) -> pa.Table:
    """Deterministic REAL-WAV table: sine clips of varying frequency and
    length, decodable by AudioFeatureStage's stdlib path."""
    rng = np.random.default_rng(seed)
    payloads, durs = [], []
    for _ in range(n):
        dur = float(rng.uniform(0.05, 0.3))
        freq = float(rng.uniform(100, 2000))
        ts = np.arange(int(dur * rate)) / rate
        samples = (np.sin(2 * np.pi * freq * ts) * 12_000).astype(np.int16)
        payloads.append(encode_wav(samples, rate))
        durs.append(dur)
    return pa.table({
        "media_id": pa.array(range(n), type=pa.int64()),
        "payload": pa.array(payloads, type=pa.binary()),
        "mime": pa.array(["audio/wav"] * n),
        "duration_hint": pa.array(durs, type=pa.float64()),
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
