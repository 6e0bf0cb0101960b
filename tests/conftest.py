import pytest


@pytest.fixture(scope="session")
def spark():
    from columnstore_spark.session import get_spark

    s = get_spark(app="columnstore-tests", master="local[8]",
                  shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts(spark):
    from columnstore_spark.sources.transcripts import load_transcripts

    df = load_transcripts(spark, "/root/testdata/sf0.001").cache()
    df.count()
    return df
