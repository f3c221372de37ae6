"""Ray-Data-native rebuild of the Web-Crawler-Search-Engine reference.

A brand-new engine (NOT a port) expressing the reference's crawl / index /
search semantics as ``ray.data.Dataset`` pipelines: ``map_batches`` over
zero-copy Arrow batches, actor pools for stateful stages (URL-seen set,
robots cache, tokenizers), and explicit groupby/sort shuffles for the wide
steps (politeness scheduling, postings scoring, dedup, analytics).

Layout:
    functions/  pure, vectorized kernels (URL canon/validity, tokenizers, hashes)
    sources/    synthetic-web fixture generator + parquet readers
    stages/     map_batches stages (fetch-join, extract, tokenize, index, dedup, ...)
    state/      cross-wave actors (seen-set shards, robots cache) + checkpoints
    pipelines/  driver-side composition (crawl wave loop, index build, search)
    oracle.py   pure-Python single-worker reference-semantics model (conformance)

Nothing here calls ``ray.init`` — sessions are owned by the caller
(tests' conftest fixture, bench.py, or the driver harness).
"""

__version__ = "0.1.0"
