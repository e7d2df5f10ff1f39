import pytest

from sqlite_otel_spark.session import get_spark

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def transcripts_df(spark, rows):
    return spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)
