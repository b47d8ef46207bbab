"""Shared fixtures — deterministic, offline (SURVEY.md §5.2).

Unlike the reference's conftest (which downloads a live wiki dump,
/root/reference/tests/conftest.py:22-29), everything here is synthesized
with seed=42 and runs with no network.
"""

from __future__ import annotations

import pytest

from sparkrec.datagen import SEED, gen_queries, gen_transcripts_pdf
from sparkrec.session import get_spark

N_CONVS = 60  # ~small: unit-test scale per FIXTURES.md §1


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="sparkrec-tests",
        master="local[4]",
        shuffle_partitions=8,
    )
    yield s


@pytest.fixture(scope="session")
def transcripts_pdf():
    return gen_transcripts_pdf(N_CONVS, SEED)


@pytest.fixture(scope="session")
def transcripts(spark, transcripts_pdf):
    df = spark.createDataFrame(transcripts_pdf)
    df = df.repartition(8)  # prove nothing relies on physical order
    df.cache().count()
    return df


@pytest.fixture(scope="session")
def queries_pdf():
    return gen_queries(N_CONVS, SEED)
