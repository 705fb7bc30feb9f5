"""Single-threaded reference frontier simulator (conformance oracle).

Implements the exact deterministic crawl spec of pipelines/frontier.py in
plain sequential Python (no Ray): same within-round URL dedup, seen set,
robots skip, per-host quota, global priority budget (a literal sequential
greedy walk), link discovery and seq assignment. The engine must produce
an identical crawl order, seen set and extracted text at any parallelism
level (SURVEY.md §5c / BASELINE.md correctness invariant).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import pyarrow.dataset as pads
import pyarrow.parquet as pq

from ..stages.extract import extract_one
from ..stages.politeness import (
    host_quota,
    is_disallowed,
    load_robots,
)
from ..util import hash_string, host_of, path_of


@dataclass
class SimResult:
    # (round, rank_in_round, url, priority, seq, found)
    crawl_order: list[tuple] = field(default_factory=list)
    seen_hashes: set[int] = field(default_factory=set)
    texts: dict[str, str] = field(default_factory=dict)
    errors: list[str] = field(default_factory=list)
    robots_skipped: list[str] = field(default_factory=list)
    rounds: int = 0


def simulate_crawl(
    corpus_dir: str,
    *,
    budget_per_round: int | None = 50,
    round_ms: int = 1000,
    priority_decay: float = 0.5,
    max_depth: int = 8,
    max_rounds: int = 100,
    seeds_path: str | None = None,
) -> SimResult:
    pages_ds = pads.dataset(os.path.join(corpus_dir, "pages"), partitioning="hive")
    pt = pages_ds.to_table(columns=["url", "html"])
    pages = dict(zip(pt["url"].to_pylist(), pt["html"].to_pylist()))
    robots = load_robots(os.path.join(corpus_dir, "robots.parquet"))
    seeds = pq.read_table(
        seeds_path or os.path.join(corpus_dir, "seeds.parquet"))

    res = SimResult()
    # frontier rows: (url, host, path, priority, depth, seq)
    frontier = [
        (u, host_of(u), path_of(u), float(p), 0, f"{int(s):06d}")
        for u, p, s in zip(
            seeds["url"].to_pylist(),
            seeds["priority"].to_pylist(),
            seeds["seed_id"].to_pylist(),
        )
    ]

    for r in range(max_rounds):
        if not frontier:
            break
        # 1. within-round dedup by url: keep (priority DESC, seq ASC) winner
        best: dict[str, tuple] = {}
        for row in frontier:
            cur = best.get(row[0])
            if cur is None or (-row[3], row[5]) < (-cur[3], cur[5]):
                best[row[0]] = row
        cand = list(best.values())
        # 2. seen filter
        cand = [row for row in cand if hash_string(row[0]) not in res.seen_hashes]
        # 3. robots
        kept = []
        for row in cand:
            if is_disallowed(robots, row[1], row[2]):
                res.seen_hashes.add(hash_string(row[0]))
                res.robots_skipped.append(row[0])
            else:
                kept.append(row)
        # 4+5. sequential greedy: global (priority DESC, seq ASC) walk with
        # per-host quotas and the global budget
        kept.sort(key=lambda row: (-row[3], row[5]))
        taken: list[tuple] = []
        deferred: list[tuple] = []
        per_host: dict[str, int] = {}
        for row in kept:
            q = host_quota(robots, row[1], round_ms)
            if per_host.get(row[1], 0) >= q:
                deferred.append(row)
            elif budget_per_round is not None and len(taken) >= budget_per_round:
                deferred.append(row)
            else:
                per_host[row[1]] = per_host.get(row[1], 0) + 1
                taken.append(row)
        # 6. fetch + extract
        children: list[tuple] = []
        for rank, row in enumerate(taken):
            url, host, path, pri, depth, seq = row
            res.seen_hashes.add(hash_string(url))
            html = pages.get(url)
            found = html is not None
            res.crawl_order.append((r, rank, url, pri, seq, found))
            if not found:
                res.errors.append(url)
                continue
            e = extract_one(url, html)
            if e["parse_ok"]:
                res.texts[url] = e["text"]
            if depth + 1 <= max_depth:
                for idx, u in enumerate(e["links"]):
                    children.append(
                        (
                            u,
                            host_of(u),
                            path_of(u),
                            pri * priority_decay,
                            depth + 1,
                            f"{seq}{idx:05d}",
                        )
                    )
        frontier = children + deferred
        res.rounds = r + 1
        if not frontier:
            break
    return res
