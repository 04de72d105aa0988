import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SAMPLES = "/root/reference/samples"
TESTDATA = os.environ.get("GRAFT_TESTDATA", "/root/testdata")


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (driver contract)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session", params=["sf0.001", "sf0.01", "sf0.1"])
def sf_dir(request):
    """All three shipped tiers: the smallest, the driver's correctness-gate
    tier (sf0.01), and sf0.1 (5k docs / 2k embeddings) whose multi-block
    corpora exercise the bucketing / segment-cap / partial-fusion paths that
    single-block tiers cannot."""
    return os.path.join(TESTDATA, request.param)


def sample(name: str) -> bytes:
    with open(os.path.join(SAMPLES, name), "rb") as f:
        return f.read()
