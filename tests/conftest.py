import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
def tiny_graph():
    """FIXTURES.md §5: 7 vertices, edges 0->1,0->2,1->2,2->0,3->2,4->5,
    vertex 6 isolated.  Self-loops NOT included (engine adds them)."""
    src = np.array([0, 0, 1, 2, 3, 4], dtype=np.uint64)
    dst = np.array([1, 2, 2, 0, 2, 5], dtype=np.uint64)
    return src, dst, 7


@pytest.fixture(scope="session")
def pages_1k(ray_session, tmp_path_factory):
    """1000-page synthetic corpus written once per session."""
    from pagerank_barrierfree_openmp_dynamic_ray.sources.pages import write_pages

    path = str(tmp_path_factory.mktemp("corpus") / "pages")
    write_pages(path, 1000)
    return path
