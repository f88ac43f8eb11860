import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def golden(name):
    return np.loadtxt(os.path.join(GOLDEN_DIR, name))


@pytest.fixture(scope="session")
def sampledata():
    return golden("sampledata.txt")


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (never per test/module)."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    try:
        from ray.data import DataContext

        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False
    except Exception:
        pass
    yield ray
    ray.shutdown()
