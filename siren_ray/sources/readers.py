"""Source readers beyond the Parquet pages corpus.

S13 (local JSON file reader, /root/reference/siren/scrapers/online/
mirror.py:159-167): ``ray.data.read_json`` with schema normalization.
S12 (OCR pagemeta reader, readwhere/ocr.py:140-151): nested tile-pyramid
JSON -> flattened one-tile-per-row table (SURVEY.md §1.1 "OCR tile
graph").
"""

from __future__ import annotations

import json

import pyarrow as pa


def read_json_records(path: str):
    """S13: local JSON array-of-records file -> Dataset."""
    import ray.data as rd

    return rd.read_json(path)


PAGEMETA_TILE_SCHEMA = pa.schema(
    [
        ("page_key", pa.string()),
        ("pagenum", pa.int32()),
        ("level", pa.string()),
        ("level_width", pa.int32()),
        ("level_height", pa.int32()),
        ("tx", pa.int32()),
        ("ty", pa.int32()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("url", pa.string()),
    ]
)

_LEVELS = ("thumbs", "level0", "leveldefault", "level1", "level2", "header")


def flatten_pagemeta(raw: bytes | str, *, levels=("level2",)) -> pa.Table:
    """PageMeta JSON (``{pagenum: {key, pagenum, levels: {level: {width,
    height, chunks: [{tx,ty,width,height,url}]}}}}``, ocr.py:20-77,99-110)
    -> one row per tile. The reference OCRs only ``level2`` (ocr.py:81);
    ``levels`` widens that."""
    data = json.loads(raw if isinstance(raw, str) else raw.decode())
    rows = {name: [] for name in PAGEMETA_TILE_SCHEMA.names}
    for _page_no, page in data.items():
        for level_name in levels:
            assert level_name in _LEVELS, level_name
            level = page["levels"].get(level_name)
            if not level:
                continue
            for chunk in level.get("chunks", []):
                rows["page_key"].append(page["key"])
                rows["pagenum"].append(int(page["pagenum"]))
                rows["level"].append(level_name)
                rows["level_width"].append(int(level["width"]))
                rows["level_height"].append(int(level["height"]))
                rows["tx"].append(int(chunk["tx"]))
                rows["ty"].append(int(chunk["ty"]))
                rows["width"].append(int(chunk["width"]))
                rows["height"].append(int(chunk["height"]))
                rows["url"].append(chunk["url"])
    return pa.table(
        {n: pa.array(rows[n], PAGEMETA_TILE_SCHEMA.field(n).type)
         for n in PAGEMETA_TILE_SCHEMA.names}
    )


def make_pagemeta_fixture(n_pages: int = 3, tiles_per_level: int = 4,
                          seed: int = 9) -> str:
    """Deterministic pagemeta JSON in the reference's shape."""
    import random

    rng = random.Random(seed)
    pages = {}
    for p in range(1, n_pages + 1):
        levels = {}
        for lv in _LEVELS:
            levels[lv] = {
                "width": 512 * 4,
                "height": 512 * 2,
                "chunks": [
                    {
                        "tx": (t % 4) * 512,
                        "ty": (t // 4) * 512,
                        "width": 512,
                        "height": 512,
                        "url": f"https://tiles.example.org/{p}/{lv}/{t}.jpg",
                    }
                    for t in range(tiles_per_level)
                ],
            }
        pages[str(p)] = {
            "key": f"k{rng.randrange(10**6)}",
            "pagenum": p,
            "levels": levels,
        }
    return json.dumps(pages)
