"""Shared fixtures: reference-module import (oracle) and a SparkSession."""

from __future__ import annotations

import os
import sys
import types

import pytest

REFERENCE_DIR = "/root/reference"
REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)


def _install_bs4_stub() -> None:
    """The container has no bs4; the reference's pure URL functions never
    touch it, so a stub satisfies ``from bs4 import BeautifulSoup`` at
    import time (reference scraper.py:3)."""
    if "bs4" in sys.modules:
        return
    stub = types.ModuleType("bs4")

    class BeautifulSoup:  # pragma: no cover - import-time placeholder only
        def __init__(self, *args, **kwargs):
            raise RuntimeError("bs4 stub: not usable for parsing in tests")

    stub.BeautifulSoup = BeautifulSoup
    sys.modules["bs4"] = stub


@pytest.fixture(scope="session")
def reference():
    """Import the reference repo's modules (read-only oracle).

    Returns a namespace with ``scraper``, ``utils``, ``similarity``,
    ``analyze_crawl`` loaded from /root/reference.
    """
    _install_bs4_stub()
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import analyze_crawl  # noqa: F401
    import scraper  # noqa: F401
    import utils  # noqa: F401
    from utils import similarity  # noqa: F401

    ns = types.SimpleNamespace(
        scraper=scraper,
        utils=utils,
        similarity=similarity,
        analyze_crawl=analyze_crawl,
    )
    return ns


@pytest.fixture(scope="session")
def spark():
    from spacetime_crawler4py_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark(app_name="tests", shuffle_partitions=8)
    yield spark
    spark.stop()
