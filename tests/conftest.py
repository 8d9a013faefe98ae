import os

import pytest


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole test run (driver contract)."""
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
def small_fixture_dir(tmp_path_factory) -> str:
    """1k-row synthetic images fixture (FIXTURES.md sf=xs), cached."""
    from stack_trace_deduplication_ray.fixtures.images import materialize_fixture

    return materialize_fixture(1000, seed=42)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
