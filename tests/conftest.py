import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    from sgspark.session import get_spark
    s = get_spark("sgspark-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def docs500(spark):
    from sgspark.synth import synth_documents
    return synth_documents(spark, 500).cache()


@pytest.fixture(scope="session")
def zones50(spark):
    from sgspark.synth import synth_zones
    return synth_zones(spark, 50).cache()
