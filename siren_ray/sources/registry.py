"""Pipeline registry (S14): the reference auto-registers scrapers by
globbing ``siren/scrapers/**/*.py`` and collecting ``__all__``
(/root/reference/siren/__init__.py:9-18), keyed like
``"online.indiatoday.IndiaTodayOnlineScraper"``. The engine equivalent is
an explicit registry mapping those keys to pipeline factories; a user of
the reference looks up the same name and gets the Ray-Data pipeline.

All 14 reference keys are present (dummy 1, online.mirror 3,
online.indiatoday 1, online.telegraph 1, online.newsminute 1, epaper.ht 1,
epaper.telegraph 1, epaper.toi 1, epaper.readwhere 4).

Each factory has signature ``(corpus_dir, *, start, end, keywords) ->
ray.data.Dataset``; families that ignore an argument accept and drop it
(matching BaseScraper's uniform ctor, core/scraper.py:67-84).
"""

from __future__ import annotations

from datetime import datetime

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
    from ..pipelines.telegraph_online import telegraph_online_pipeline

    return telegraph_online_pipeline(corpus_dir, start=start, end=end,
                                     keywords=list(keywords))


def _newsminute(corpus_dir, *, start=WINDOW_START, end=WINDOW_END,
                keywords=("suicide",)):
    from ..pipelines.newsminute import newsminute_pipeline

    return newsminute_pipeline(corpus_dir, start=start, end=end,
                               keywords=list(keywords))


def _readwhere(paper: str, ocr: bool = False):
    def factory(corpus_dir, *, start=WINDOW_START, end=WINDOW_END,
                keywords=("suicide",)):
        from ..pipelines import readwhere as RW

        fn = RW.readwhere_ocr_pipeline if ocr else RW.readwhere_pipeline
        return fn(corpus_dir, paper, start=start, end=end,
                  keywords=list(keywords))

    return factory


def _pune_mirror(corpus_dir, *, start=WINDOW_START, end=WINDOW_END,
                 keywords=()):
    """S13: the reference's PuneMirror scraper is DISABLED (an early
    ``return []`` before the local-JSON read, mirror.py:159-167) — the
    faithful pipeline is an empty result with the article schema."""
    import pyarrow as pa
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "url": pa.array([], pa.string()),
                "headline": pa.array([], pa.string()),
                "author": pa.array([], pa.string()),
                "published_ts": pa.array([], pa.timestamp("us")),
                "text": pa.array([], pa.string()),
            }
        )
    )


def _dummy(corpus_dir, *, start=None, end=None, keywords=()):
    """The reference's no-IO smoke scraper (dummy.py:15-22): two fixed
    records. The reference stamps ``datetime.now()``; the engine pins a
    fixed timestamp (deterministic-output divergence, documented)."""
    import ray.data as rd

    ts = datetime(2024, 1, 1)
    return rd.from_items(
        [
            {"data": "Dummy Sample A", "date": ts},
            {"data": "Dummy Sample B", "date": ts},
        ]
    )


PIPELINES = {
    "dummy.DummyScraper": _dummy,
    # online editions
    "online.mirror.MumbaiMirrorOnlineScraper": _mirror,
    "online.mirror.BangaloreMirrorOnlineScraper": _mirror,
    "online.mirror.PuneMirrorOnlineScraper": _pune_mirror,
    "online.indiatoday.IndiaTodayOnlineScraper": _indiatoday,
    "online.telegraph.TelegraphOnlineScraper": _tg_online,
    "online.newsminute.NMScraper": _newsminute,
    # e-papers
    "epaper.ht.HTScraper": _ht,
    "epaper.telegraph.TGScraper": _tg_epaper,
    "epaper.toi.TOIScraper": _toi,
    "epaper.readwhere.tie.TIEScraper": _readwhere("tie"),
    "epaper.readwhere.tie.TIEScraperOCR": _readwhere("tie", ocr=True),
    "epaper.readwhere.tnie.TNIEScraper": _readwhere("tnie"),
    "epaper.readwhere.tribune.TribuneScraper": _readwhere("tribune"),
}


def get_pipeline(name: str):
    """Registry lookup, same contract as SCRAPERS.get (reference
    __main__.py:151)."""
    return PIPELINES.get(name)


# --- clean() post-hook (reference scraper.py:141-142) ----------------------
# The reference runs ``self.clean(results)`` on the scraped rows before
# serialization — identity in BaseScraper, overridable per scraper. The
# engine equivalent is a per-pipeline BATCH hook (pa.Table -> pa.Table)
# applied after the pipeline and before projection/serialization; absent
# entries mean identity, exactly the reference default.
CLEAN_HOOKS: dict = {}


def register_clean_hook(name: str, fn) -> None:
    """Register/override a pipeline's clean() batch hook."""
    CLEAN_HOOKS[name] = fn


def apply_clean_hook(name: str, ds):
    """Apply the pipeline's clean() hook (identity when unregistered)."""
    fn = CLEAN_HOOKS.get(name)
    if fn is None:
        return ds
    return ds.map_batches(fn, batch_format="pyarrow")
