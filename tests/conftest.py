"""Shared fixtures. Ray is initialised ONCE per pytest session (driver
contract); library code never calls ray.init itself."""

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

    DataContext.get_current().enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def source_files_path(tmp_path_factory):
    from universal_parquet_exporter_ray.datagen import write_source_files

    p = tmp_path_factory.mktemp("fixtures") / "source_files_2k.parquet"
    return write_source_files(str(p), 2000)


SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf_small():
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_med():
    return SF_MED
