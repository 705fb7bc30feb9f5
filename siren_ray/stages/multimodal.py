"""Multimodal columns: binary payloads + typed metadata, actor-pool stages.

Mirrors the reference's OCR tile path (SURVEY.md §2.3 P8 / §2.8 T2,
/root/reference/siren/scrapers/epaper/readwhere/ocr.py): bytes -> decode ->
grayscale -> OCR, with the engine loaded ONCE per worker (the reference's
commented-out module-scope ``easyocr.Reader`` and the
``ThreadPoolExecutor(max_workers=1)`` pinning, ocr.py:14-17,191-192,
become per-actor ``__init__`` + per-stage ``num_cpus``).

The container has no PIL/pytesseract, so the decode/OCR kernel is a
clearly-marked deterministic stand-in (``FakeOcrEngine``): the Ray-side
plumbing — schema, actor signature, batch sizing, per-actor init cost,
empty-result filtering (Q6, ocr.py:87-91) — is real and tested. Swap
``ENGINE_FACTORY`` for a real engine in production.
"""

from __future__ import annotations

import hashlib
import time

import numpy as np
import pyarrow as pa

TILE_SCHEMA = pa.schema(
    [
        ("page_id", pa.int64()),
        ("pagenum", pa.int32()),
        ("level", pa.string()),
        ("tx", pa.int32()),
        ("ty", pa.int32()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("url", pa.string()),
        ("data", pa.binary()),
    ]
)


class FakeOcrEngine:
    """Deterministic stand-in OCR engine with a visible one-time init cost.

    Real systems: replace with pytesseract / easyocr; the actor contract
    is identical. ``image_to_string`` is a pure function of the bytes:
    blobs whose first byte is odd "contain" text (exercises the
    keep-non-empty filter, ocr.py:87-91).
    """

    def __init__(self, init_cost_s: float = 0.05):
        time.sleep(init_cost_s)  # stands in for model load
        self.ready = True

    def image_to_string(self, data: bytes) -> str:
        if not data:
            return ""
        digest = hashlib.blake2b(data, digest_size=8).hexdigest()
        if data[0] % 2 == 1:
            return f"tile-text-{digest}"
        return ""


ENGINE_FACTORY = FakeOcrEngine


class OcrTiles:
    """Actor-pool stage: OCR a batch of tiles; engine built once per actor.

    Use: ``ds.map_batches(OcrTiles, concurrency=N, batch_size=B,
    num_cpus=1)`` — concurrency×num_cpus sized to the node like the
    reference's ``(os.cpu_count()+4)//4`` heuristic (README.md:41).
    """

    def __init__(self, data_col: str = "data"):
        self.engine = ENGINE_FACTORY()
        self.data_col = data_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [
            self.engine.image_to_string(d) if d is not None else ""
            for d in batch[self.data_col].to_pylist()
        ]
        out = batch.drop_columns([self.data_col])  # payload stays in-actor
        return out.append_column("ocr_text", pa.array(texts, pa.string()))


def decode_image_stub(data: bytes) -> "np.ndarray":
    """Image decode placeholder: no codec libs in this container.

    The production kernel is ``PIL.Image.open(BytesIO(data)).convert(
    "RGBA")`` then grayscale (ocr.py:33-36).
    """
    raise NotImplementedError(
        "image decoding requires PIL/opencv; not available in this container"
    )


def make_tiles(n: int, tiles_per_page: int = 12, seed: int = 5) -> pa.Table:
    """Deterministic synthetic tile table (pagemeta pyramid flattened to
    one-tile-per-row, SURVEY.md §1.1 'OCR tile graph')."""
    rng = np.random.RandomState(seed)
    rows = {k: [] for k in
            ("page_id", "pagenum", "level", "tx", "ty", "width", "height",
             "url", "data")}
    for p in range(n):
        for t in range(tiles_per_page):
            rows["page_id"].append(p)
            rows["pagenum"].append(p % 50 + 1)
            rows["level"].append("level2")
            rows["tx"].append(t % 4 * 512)
            rows["ty"].append(t // 4 * 512)
            rows["width"].append(512)
            rows["height"].append(512)
            rows["url"].append(f"https://tiles.example.org/{p}/{t}.jpg")
            rows["data"].append(rng.bytes(64))
    return pa.table(
        {name: pa.array(vals, TILE_SCHEMA.field(name).type)
         for name, vals in rows.items()}
    )


class BinaryFeatures:
    """Actor-pool feature-extract stage: opaque binary payload -> fixed-dim
    L2-normalized float32 vector via a hashed byte-trigram bag (the same
    compute shape as CLIP-style embed-the-blob inference: weights/buffers
    built once per actor in ``__init__``, one vectorized pass per batch).
    The trigram hasher is the honest no-codec stand-in for a real image/
    audio encoder; swap ``features_of`` for a model forward pass and the
    actor contract (init-once, batch in, vectors out) is unchanged.

    Use: ``ds.map_batches(BinaryFeatures, concurrency=N, batch_size=B)``
    — keep ``batch_size`` small for large blobs (batch bytes x
    concurrency must fit the worker heap).
    """

    def __init__(self, data_col: str = "data", n_features: int = 256):
        self.data_col = data_col
        self.n_features = n_features
        self._buf = np.zeros((0, n_features), dtype=np.float32)

    def features_of(self, data: bytes, out: np.ndarray) -> None:
        if not data or len(data) < 3:
            out[:] = 0.0
            return
        b = np.frombuffer(data, dtype=np.uint8)
        codes = (
            b[:-2].astype(np.int64) * 65536
            + b[1:-1].astype(np.int64) * 256
            + b[2:].astype(np.int64)
        ) % self.n_features
        np.copyto(out, np.bincount(codes, minlength=self.n_features),
                  casting="unsafe")
        n = np.linalg.norm(out)
        if n > 0:
            out /= n

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.data_col].to_pylist()
        if self._buf.shape[0] < len(blobs):
            self._buf = np.zeros((len(blobs), self.n_features), np.float32)
        mat = self._buf[:len(blobs)]
        for i, d in enumerate(blobs):
            self.features_of(d or b"", mat[i])
        out = batch.drop_columns([self.data_col])  # payload stays in-actor
        # COPY on emit: pa.array zero-copies numpy, and self._buf is
        # overwritten by the next batch — aliasing it would silently
        # corrupt already-returned vectors
        flat = mat.reshape(-1).copy()
        return out.append_column(
            "features",
            pa.FixedSizeListArray.from_arrays(
                pa.array(flat, pa.float32()), self.n_features
            ).cast(pa.list_(pa.float32())),
        )


def frame_sample(batch: pa.Table, data_col: str = "data",
                 n_frames: int = 4, frame_size: int = 16) -> pa.Table:
    """Frame-sampling stage for video-like blobs: emit ``n_frames``
    evenly-spaced fixed-size byte windows per blob as child rows carrying
    the parent's columns plus (frame_idx, frame_offset, frame). This is
    the row-explosion plumbing (per-parent fan-out, metadata carry,
    payload slicing) of real keyframe sampling; the production kernel
    decodes with pyav/ffmpeg at the same offsets — no codec in this
    container (same policy as ``decode_image_stub``). Blobs shorter than
    one frame yield a single truncated frame; null blobs yield none.
    """
    blobs = batch[data_col].to_pylist()
    parent_idx: list[int] = []
    fidx: list[int] = []
    foff: list[int] = []
    frames: list[bytes] = []
    for i, d in enumerate(blobs):
        if not d:
            continue
        k = min(n_frames, max(1, len(d) // frame_size))
        span = max(1, (len(d) - frame_size) // max(1, k - 1)) if k > 1 else 0
        for j in range(k):
            off = min(j * span, max(0, len(d) - frame_size))
            parent_idx.append(i)
            fidx.append(j)
            foff.append(off)
            frames.append(d[off:off + frame_size])
    out = batch.drop_columns([data_col]).take(pa.array(parent_idx, pa.int64()))
    return (
        out.append_column("frame_idx", pa.array(fidx, pa.int32()))
        .append_column("frame_offset", pa.array(foff, pa.int64()))
        .append_column("frame", pa.array(frames, pa.binary()))
    )


def resize_image_stub(data: bytes, width: int, height: int) -> bytes:
    """Resize placeholder: resizing requires decoding (PIL/opencv), which
    this container lacks. Production kernel: ``PIL.Image.open(...)
    .resize((width, height))`` inside the same actor that decodes."""
    raise NotImplementedError(
        "image resize requires PIL/opencv; not available in this container"
    )
