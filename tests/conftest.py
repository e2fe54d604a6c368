"""Shared fixtures.

Ray is initialised ONCE per pytest session (only when a test actually
requests the ``ray_session`` fixture, so the pure-Python oracle tests stay
fast) and shut down at teardown.
"""

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
    yield
    ray.shutdown()


def epoch_us(y, mo, d, h=0, mi=0, s=0, us=0):
    """UTC epoch microseconds for a civil datetime (test expectation helper)."""
    import datetime as dt

    return int(
        dt.datetime(y, mo, d, h, mi, s, us, tzinfo=dt.timezone.utc).timestamp()
        * 1_000_000
    )
