import pytest

from fscrawler_spark.datagen import generate_transcripts
from fscrawler_spark.session import get_spark


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    s = get_spark(
        app="fscrawler-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra={"spark.sql.warehouse.dir": str(wh)},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("transcripts")
    generate_transcripts(str(d), n_turns=3_000, seed=42)
    return str(d)
