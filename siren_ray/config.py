"""Run configuration mirroring the reference CLI/TOML contract.

Reference: /root/reference/siren/__main__.py:28-77 — same field names
(scraper, keywords, ignore_keywords, start, end, max_concurrency,
timeout, out) and the same date-defaulting rules:

- neither start nor end  -> [now, now + days]
- only start             -> [start, start + days]
- only end               -> [end - days, end]

``ignore_keywords`` is parsed by the reference but never wired into any
scraper (__main__.py:117-122; SURVEY.md §2.4 Q3 flags the gap); this
engine APPLIES it as a NOT-contains filter and documents the divergence.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta


def parse_date(s: str) -> datetime:
    return datetime.strptime(s, "%Y-%m-%d")


@dataclass
class RunConfig:
    scraper: str
    keywords: list[str] = field(default_factory=list)
    ignore_keywords: list[str] = field(default_factory=list)
    start: datetime | None = None
    end: datetime | None = None
    days: int = 1
    max_concurrency: int | None = 50
    timeout: int | None = None
    out: str | None = None
    corpus_dir: str | None = None

    def __post_init__(self):
        now = datetime.now()
        if self.start is None and self.end is None:
            self.start = now
            self.end = now + timedelta(days=self.days)
        elif self.start is not None and self.end is None:
            self.end = self.start + timedelta(days=self.days)
        elif self.start is None:
            self.start = self.end - timedelta(days=self.days)

    @classmethod
    def from_toml(cls, path: str) -> "RunConfig":
        import tomllib

        with open(path, "rb") as f:
            raw = tomllib.load(f)
        known = {
            "scraper", "keywords", "ignore_keywords", "start", "end",
            "days", "max_concurrency", "timeout", "out", "corpus_dir",
        }
        kw = {k: v for k, v in raw.items() if k in known}
        for key in ("start", "end"):
            if isinstance(kw.get(key), str):
                kw[key] = parse_date(kw[key])
        return cls(**kw)
