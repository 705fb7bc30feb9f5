"""Scalar functions (SURVEY.md §2.7 X1-X10) as vectorized Arrow kernels.

Each mirrors an exact reference behavior, cited inline into
/root/reference. Used by the pipelines and exposed through
``__ray_entry__.queries`` with DuckDB oracles where SQL-expressible.
"""

from __future__ import annotations

from datetime import date, datetime

import pyarrow as pa
import pyarrow.compute as pc


# X1 — core/scraper.py:15-25: datetime/date -> "%Y-%m-%d", else str()
def transform_value(item) -> str:
    if isinstance(item, (datetime, date)):
        return item.strftime("%Y-%m-%d")
    return str(item)


def serialize_column(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized X1 over a column. Nulls serialize to the string
    'None' — the reference projector str()s every value
    (scraper.py:133, transform_value(None) == 'None'), so an Arrow
    null emitting an empty CSV cell would diverge from reference CSVs
    on every nullable column."""
    t = col.type
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        out = pc.strftime(col, format="%Y-%m-%d")
    elif pa.types.is_string(t):
        out = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    else:
        out = pc.cast(col, pa.string())
    return pc.fill_null(out, "None")


# X2 — date parsers, exact formats used by the reference
DATE_FORMATS = {
    "ymd_dash": "%Y-%m-%d",  # toi.py:27-29, __main__.py:42-43
    "ymd_slash": "%Y/%m/%d",  # ht.py:52-54
    "dmy_slash": "%d/%m/%Y",  # ht.py:72-74
    "dmy_dot2": "%d.%m.%y",  # online/telegraph.py:78-82
}


def parse_dates(col, fmt_key: str) -> pa.Array:
    return pc.strptime(col, format=DATE_FORMATS[fmt_key], unit="us")


# X3 — date formatters
def format_dates(col, fmt: str = "%Y-%m-%d") -> pa.Array:
    return pc.strftime(col, format=fmt)


def to_epoch_seconds(col) -> pa.Array:
    """readwhere/core.py:169-172: int(dt.timestamp()). Divides by the
    column's OWN timestamp unit (a hardcoded 1e6 was silently wrong for
    s/ms/ns-unit columns from other writers)."""
    unit = getattr(col.type, "unit", "us")
    scale = {"s": 1, "ms": 1_000, "us": 1_000_000,
             "ns": 1_000_000_000}[unit]
    return pc.cast(pc.divide(pc.cast(col, pa.int64()), scale), pa.int64())


# X4 — URL building / carving
def lstrip_slash(col) -> pa.Array:
    """mirror.py:80 ``suburl.lstrip("/")``."""
    return pc.utf8_ltrim(col, characters="/")


def drop_first_char(col) -> pa.Array:
    """indiatoday.py:84,107 / online/telegraph.py:144 ``s[1:]``."""
    return pc.utf8_slice_codeunits(col, start=1)


# X5 — epaper/toi.py:86-92 zero-padded image URL template
def toi_image_url(dt: datetime, page: str | int, publication_code: str,
                  edition_code: str) -> str:
    year, _month, _day, *_ = dt.timetuple()
    day = f"{_day:02}"
    month = f"{_month:02}"
    page_s = f"{int(page):03}"
    return (
        f"https://asset.harnscloud.com/PublicationData/{publication_code}/"
        f"{edition_code}/{year}/{month}/{day}/Page/"
        f"{day}_{month}_{year}_{page_s}_{edition_code}.jpg"
    )


# X6 — string carving
def carve_onclick(value: str) -> str:
    """ht.py:207-209: ``onclick.split("','")[1].rstrip("' );")``."""
    return value.split("','")[1].rstrip("' );")


def last_token_int(value: str) -> int:
    """online/telegraph.py:141: ``int(results.text.split()[-1])``."""
    return int(value.split()[-1])


# X7 — coalesce
def coalesce(*cols) -> pa.Array:
    return pc.coalesce(*cols)


# X8 — toi.py:129-130: ", ".join(list)
def join_comma(items: list[str]) -> str:
    return ", ".join(items)


# X9 — lowercase (epaper/telegraph.py:82-84)
def lower(col) -> pa.Array:
    return pc.utf8_lower(col)


# X10 — the three pagination arithmetics (SURVEY.md §2.7; intentionally
# distinct conventions, reproduced exactly)
def pages_telegraph(total: int, page_size: int = 20) -> int:
    """online/telegraph.py:109-114: ``total // PAGE_SIZE``; pages iterated
    ``range(1, pages + 1)`` after page 0."""
    return total // page_size


def pages_newsminute(total: int, page_size: int = 100) -> int:
    """newsminute.py:84-90: ``(total // PAGE_SIZE) - 1``; offsets iterated
    ``range(1, pages - 1)`` (off-by-quirk intentionally reproduced)."""
    return (total // page_size) - 1


def pages_toi(total_docs: int, limit: int = 50) -> int:
    """toi.py:190: ``(totalDocs // limit) + 2``; pages ``range(2, pages+1)``."""
    return (total_docs // limit) + 2


def expand_offsets_newsminute(total: int, page_size: int = 100) -> list[int]:
    pages = pages_newsminute(total, page_size)
    return [page_size * i for i in range(1, pages - 1)]


def expand_pages_telegraph(total: int, page_size: int = 20) -> list[int]:
    return list(range(1, pages_telegraph(total, page_size) + 1))


def expand_pages_toi(total_docs: int, limit: int = 50) -> list[int]:
    return list(range(2, pages_toi(total_docs, limit) + 1))
