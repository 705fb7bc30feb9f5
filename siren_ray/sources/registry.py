"""Pipeline registry (S14): the reference auto-registers scrapers by
globbing ``siren/scrapers/**/*.py`` and collecting ``__all__``
(/root/reference/siren/__init__.py:9-18), keyed like
``"online.indiatoday.IndiaTodayOnlineScraper"``. The engine equivalent is
an explicit registry mapping those keys to pipeline factories; a user of
the reference looks up the same name and gets the Ray-Data pipeline.

Each factory has signature ``(corpus_dir, *, start, end, keywords) ->
ray.data.Dataset``; families that ignore an argument accept and drop it
(matching BaseScraper's uniform ctor, core/scraper.py:67-84).
"""

from __future__ import annotations

from ..corpus import WINDOW_END, WINDOW_START
from ..pipelines import scrapers as S


def _mirror(corpus_dir, *, start=WINDOW_START, end=WINDOW_END, keywords=()):
    return S.mirror_pipeline(corpus_dir, start=start, end=end)


def _indiatoday(corpus_dir, *, start=WINDOW_START, end=WINDOW_END,
                keywords=("suicide",)):
    return S.indiatoday_pipeline(corpus_dir, start=start, end=end,
                                 keywords=list(keywords))


def _ht(corpus_dir, *, start=None, end=None, keywords=("suicide",)):
    return S.ht_pipeline(corpus_dir, keywords=list(keywords))


def _tg_epaper(corpus_dir, *, start=None, end=None, keywords=("suicide",)):
    return S.telegraph_epaper_pipeline(corpus_dir, keywords=list(keywords))


def _toi(corpus_dir, *, start=None, end=None, keywords=("suicide",)):
    return S.toi_pipeline(corpus_dir, include_any=list(keywords),
                          start=start, end=end)


def _tg_online(corpus_dir, *, start=WINDOW_START, end=WINDOW_END,
               keywords=("suicide",)):
    # online Telegraph shares the TG article shape; date window applied
    return S.toi_pipeline(corpus_dir, include_any=list(keywords),
                          exclude_all=(), start=start, end=end)


PIPELINES = {
    # online editions
    "online.mirror.MumbaiMirrorOnlineScraper": _mirror,
    "online.mirror.BangaloreMirrorOnlineScraper": _mirror,
    "online.indiatoday.IndiaTodayOnlineScraper": _indiatoday,
    "online.telegraph.TelegraphOnlineScraper": _tg_online,
    # e-papers
    "epaper.ht.HTScraper": _ht,
    "epaper.telegraph.TGScraper": _tg_epaper,
    "epaper.toi.TOIScraper": _toi,
}


def get_pipeline(name: str):
    """Registry lookup, same contract as SCRAPERS.get (reference
    __main__.py:151)."""
    return PIPELINES.get(name)
