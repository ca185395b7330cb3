from __future__ import annotations

import pytest

from baskerville_spark.generator import GenConfig, generate_clips, generate_transcript_ref
from baskerville_spark.session import get_session


@pytest.fixture(scope="session")
def spark():
    # cpu*2 shuffle partitions mirrors the reference's test session
    # (tests/unit/baskerville_tests/helpers/spark_testing_base.py:27)
    s = get_session("baskerville-tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def t1_cfg() -> GenConfig:
    # t1 smoke tier: 1000 clips / 4 partitions — matches the reference's
    # 1k-row sample (data/samples/test_data_1k.json, README.md:355-360)
    return GenConfig(n_rows=1000, n_parts=4)


@pytest.fixture(scope="session")
def t1_clips(spark, t1_cfg):
    df = generate_clips(spark, t1_cfg)
    df = df.cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def t1_tref(spark, t1_cfg):
    df = generate_transcript_ref(spark, t1_cfg)
    df = df.cache()
    df.count()
    return df
