"""Session-scoped Ray fixture — one ray.init per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def micro_web():
    """sf-micro synthetic web: 5 hosts, ~50 docs (FIXTURES.md §6)."""
    from web_crawler_search_engine_ray.sources.synthetic_web import generate_web

    return generate_web(seed=42, num_hosts=5, num_docs=50)


@pytest.fixture(scope="session")
def small_web():
    """sf-small synthetic web: 20 hosts, ~600 docs (trimmed for test time)."""
    from web_crawler_search_engine_ray.sources.synthetic_web import generate_web

    return generate_web(seed=7, num_hosts=20, num_docs=600)
