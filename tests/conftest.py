import pytest

from fscrawler_spark.datagen import generate_transcripts
from fscrawler_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="fscrawler-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("transcripts")
    generate_transcripts(str(d), n_turns=3_000, seed=42)
    return str(d)
