"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

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
def pages_small(tmp_path_factory):
    """Deterministic synthetic pages table (FIXTURES.md §1), 200 rows."""
    from zensearch_ray.sources.pages import generate_pages_parquet

    out = tmp_path_factory.mktemp("pages") / "pages.parquet"
    generate_pages_parquet(str(out), n_rows=200, seed=42)
    return str(out)
