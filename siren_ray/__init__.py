"""siren_ray: Ray-Data-native web-crawl / text-extraction engine.

Public operator surface (lazy imports so ``import siren_ray`` stays
light and never triggers Ray):

- Crawl: ``siren_ray.pipelines.frontier`` (run_crawl / CrawlConfig),
  ``siren_ray.pipelines.simulator`` (conformance oracle),
  ``siren_ray.sources.registry`` (reference scraper names).
- Dedup: ``siren_ray.stages.dedup`` (exact, MinHash+LSH, SimHash,
  Jaccard verify, embedding near-dup, connected components,
  semi/anti-join).
- Relational: ``siren_ray.stages.relational`` (hash_join incl. full
  outer, grouped_agg, top-k, quantiles, sketches, samplers,
  snapshot_diff), ``siren_ray.stages.events`` (sessionize, windows).
- Text: ``siren_ray.functions.textstats`` / ``.pii`` / ``.packing``,
  ``siren_ray.stages.lines`` / ``.lm`` / ``.retrieval``.
- Vectors: ``siren_ray.stages.ann`` (kNN, IVF, k-means, cosine pairs),
  ``siren_ray.stages.graph`` (PageRank).
- Sources/sinks: ``siren_ray.sources.warc``, ``.readers``,
  ``siren_ray.functions.project`` (CSV/Parquet sinks, resumable).
"""
__version__ = "0.3.0"
