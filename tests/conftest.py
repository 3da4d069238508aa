from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from multi_format_document_extractor_spark import corpus  # noqa: E402
from multi_format_document_extractor_spark.session import get_spark  # noqa: E402

CORPUS_N = 1000
CORPUS_SEED = 42


@pytest.fixture(scope="session")
def spark():
    s = get_spark("mfde-tests", cores=4, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("corpus")
    corpus.write_corpus(str(d), CORPUS_N, CORPUS_SEED)
    return str(d)


@pytest.fixture(scope="session")
def corpus_rows():
    return corpus.gen_rows(CORPUS_N, CORPUS_SEED)
