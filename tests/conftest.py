from __future__ import annotations

import shutil

import pytest

from cs537_spring2021_p3a_mapreduce_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest")
    s.sparkContext.setLogLevel("WARN")
    yield s


@pytest.fixture(scope="session")
def events_stream_dir(tmp_path_factory) -> str:
    """events.parquet copied into a directory — the file-stream
    source requires a directory basePath, not a bare file."""
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF_SMOKE}/events.parquet", d / "part-0.parquet")
    return str(d)


@pytest.fixture(scope="session")
def documents_stream_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("documents_stream")
    shutil.copy(f"{SF_SMOKE}/documents.parquet", d / "part-0.parquet")
    return str(d)
