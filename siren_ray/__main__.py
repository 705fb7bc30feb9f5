"""CLI entry: ``python -m siren_ray --scraper <name> ...``.

Mirrors the reference lifecycle (/root/reference/siren/__main__.py →
SURVEY.md §3.1): config -> registry lookup -> pipeline run -> projected
CSV written under the W4 naming scheme. ``--scraper all`` runs every
registered pipeline (§3.2 run_all), outputs routed per-pipeline (W6).
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None, backend=None) -> int:
    """``backend``: a :class:`siren_ray.sources.cloud.CloudBackend`
    instance overriding the default LocalFolderBackend (tests inject a
    recording backend; production injects Drive/S3)."""
    p = argparse.ArgumentParser(prog="siren_ray")
    p.add_argument("--scraper", required=False, default=None)
    p.add_argument("--config", default=None)
    p.add_argument("--keywords", nargs="+", default=[])
    p.add_argument("--ignore-keywords", nargs="+", default=[])
    p.add_argument("--start", default=None)
    p.add_argument("--end", default=None)
    p.add_argument("--days", type=int, default=1)
    p.add_argument("--max-concurrency", type=int, default=50)
    p.add_argument("--out", default=".")
    p.add_argument("--sf", type=float, default=0.001)
    p.add_argument("--num-cpus", type=int, default=8)
    args = p.parse_args(argv)

    from .config import RunConfig, parse_date

    if args.config:
        cfg = RunConfig.from_toml(args.config)
    else:
        if not args.scraper:
            print("--scraper or --config required")
            return 2
        cfg = RunConfig(
            scraper=args.scraper,
            keywords=args.keywords,
            ignore_keywords=args.ignore_keywords,
            start=parse_date(args.start) if args.start else None,
            end=parse_date(args.end) if args.end else None,
            days=args.days,
            max_concurrency=args.max_concurrency,
            out=args.out,
        )

    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray:
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .corpus import ensure_corpus
    from .functions.project import ProjectionSpec, write_projected_csv
    from .sources.cloud import LocalFolderBackend, upload_routed
    from .sources.registry import PIPELINES, apply_clean_hook, get_pipeline

    corpus = cfg.corpus_dir or ensure_corpus(args.sf)
    names = list(PIPELINES) if cfg.scraper == "all" else [cfg.scraper]
    rc = 0
    # W6/T4: outputs route through the CloudBackend protocol — one
    # folder per scraper class (reference cloud.py:70-78: Drive folder
    # per origin, created on first use and cached). The default backend
    # is the local filesystem; production swaps in Drive/S3 via the
    # ``backend`` parameter without touching pipeline code.
    backend = backend or LocalFolderBackend(cfg.out or ".")
    import shutil
    import tempfile

    staging = tempfile.mkdtemp(prefix="siren_ray_out_")
    try:
        for name in names:
            factory = get_pipeline(name)
            if factory is None:
                print(f"Could not find scraper {name}!")  # __main__.py:157-159
                rc = 1
                continue
            t0 = time.perf_counter()
            ds = factory(corpus, start=cfg.start, end=cfg.end,
                         keywords=cfg.keywords or ("suicide",))
            # clean() post-hook (scraper.py:141-142; identity by default)
            ds = apply_clean_hook(name, ds)
            origin = name.rsplit(".", 1)[-1]
            # reference lifecycle: write the projected CSV locally, then
            # deliver through the backend into the origin's folder
            local = write_projected_csv(
                ds, ProjectionSpec(), staging,
                origin, cfg.start, cfg.end,
            )
            path = upload_routed(backend, local, origin)
            print(f"{name} completed in "
                  f"{time.perf_counter() - t0:.1f}s -> {path}")
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    if owns_ray:
        ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
