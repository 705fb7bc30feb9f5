"""CLI entry: ``python -m siren_ray --scraper <name> ...``.

Mirrors the reference lifecycle (/root/reference/siren/__main__.py →
SURVEY.md §3.1): config -> registry lookup -> pipeline run -> projected
CSV written under the W4 naming scheme. ``--scraper all`` runs every
registered pipeline (§3.2 run_all), outputs routed per-pipeline (W6).

``python -m siren_ray crawl ...`` is the frontier-crawl JOB entry —
the unit a cluster submits with ``ray job submit --working-dir . --
python -m siren_ray crawl --address auto ...``: it attaches to the
cluster Ray (or starts a local one), runs the frontier engine, and
prints ONE JSON summary line with per-stage wall/throughput metrics
(the full per-round record lands in ``<out>/metrics.jsonl``).
Re-submitting with ``--resume`` continues from the checkpointed
seen-set/frontier after preemption.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def crawl_main(argv=None) -> int:
    """Frontier-crawl job entry (see module docstring)."""
    p = argparse.ArgumentParser(prog="siren_ray crawl")
    p.add_argument("--corpus", default=None,
                   help="pages corpus dir (default: synthesize at --sf)")
    p.add_argument("--out", required=True)
    p.add_argument("--sf", type=float, default=0.001)
    p.add_argument("--seeds", default=None,
                   help="seed parquet override (e.g. reprioritized)")
    p.add_argument("--budget", type=int, default=50,
                   help="politeness budget per round (0 = unlimited)")
    p.add_argument("--max-rounds", type=int, default=100)
    p.add_argument("--max-depth", type=int, default=8)
    p.add_argument("--scheduler", default="auto",
                   choices=["auto", "driver", "distributed"])
    p.add_argument("--fetch-mode", default="broadcast",
                   choices=["broadcast", "bucketed", "http"])
    p.add_argument("--http-base", default=None)
    p.add_argument("--fetch-concurrency", type=int, default=4)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--canonicalize", action="store_true")
    p.add_argument("--trap-filter", action="store_true")
    p.add_argument("--enrich-text", action="store_true")
    p.add_argument("--seen-mode", default="exact",
                   choices=["exact", "compact"],
                   help="seen-set storage: exact 64-bit fingerprints "
                        "(default) or the compact cuckoo-style filter "
                        "(~half the memory, ~1e-9 fp/query — see "
                        "BASELINE.md 'Seen-set memory')")
    p.add_argument("--address", default=None,
                   help='Ray address ("auto" inside ray job submit; '
                        'default: RAY_ADDRESS or "local")')
    p.add_argument("--num-cpus", type=int, default=8,
                   help="only applies when starting a local Ray")
    args = p.parse_args(argv)

    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray:
        addr = args.address or os.environ.get("RAY_ADDRESS") or "local"
        kw = {"include_dashboard": False, "logging_level": "ERROR"}
        if addr == "local":
            kw["num_cpus"] = args.num_cpus
        ray.init(address=addr, **kw)
        # only mutate the shared Ray Data config when this process owns
        # the session (ADVICE r4: attaching to an embedding process must
        # not flip its progress-bar setting as a side effect)
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False

    from .corpus import ensure_corpus
    from .pipelines.frontier import CrawlConfig, run_crawl

    corpus = args.corpus or ensure_corpus(args.sf)
    cfg = CrawlConfig(
        corpus_dir=corpus,
        out_dir=args.out,
        budget_per_round=args.budget or None,
        max_rounds=args.max_rounds,
        max_depth=args.max_depth,
        scheduler=args.scheduler,
        fetch_mode=args.fetch_mode,
        http_base=args.http_base,
        fetch_concurrency=args.fetch_concurrency,
        resume=args.resume,
        canonicalize=args.canonicalize,
        trap_filter=args.trap_filter,
        enrich_text=args.enrich_text,
        seeds_path=args.seeds,
        seen_mode=args.seen_mode,
    )
    t0 = time.perf_counter()
    res = run_crawl(cfg)
    wall = time.perf_counter() - t0
    stage = {k: round(sum(float(m.get(k, 0.0)) for m in res.metrics), 3)
             for k in ("t_sched", "t_fetch", "io_s", "t_frontier")}
    print(json.dumps({
        "metric": "crawl_fetch_extract_wall",
        "value": round(wall, 3), "unit": "sec",
        "rounds": res.rounds, "fetched": res.total_fetched,
        "errors": res.total_errors, "seen": res.seen_size,
        "urls_per_sec": round((res.total_fetched + res.total_errors)
                              / wall, 1) if wall else None,
        "stage_wall_s": stage,
        "out": res.out_dir,
    }))
    if owns_ray:
        ray.shutdown()
    return 0


def main(argv=None, backend=None) -> int:
    """``backend``: a :class:`siren_ray.sources.cloud.CloudBackend`
    instance overriding the default LocalFolderBackend (tests inject a
    recording backend; production injects Drive/S3)."""
    if argv is None:
        argv = sys.argv[1:]
    if argv and argv[0] == "crawl":
        return crawl_main(argv[1:])
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
        # only mutate the shared Ray Data config when this process owns
        # the session (ADVICE r4: attaching to an embedding process must
        # not flip its progress-bar setting as a side effect)
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
