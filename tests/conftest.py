import pytest


@pytest.fixture(scope="session")
def spark():
    from polyminhash_spark.session import build_session

    s = build_session(app_name="polyminhash-tests", master="local[8]",
                      shuffle_partitions=8)
    yield s
    s.stop()
