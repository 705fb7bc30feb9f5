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
