import os
import shutil
import tempfile

import pytest

from baselinr_spark.session import build_session
from baselinr_spark.sources.pages import generate_pages_pandas, write_pages_warehouse

N_E2E_DOCS = 400
SEED = 42


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="baselinr_spark_tests", master="local[4]",
                      shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_pdf():
    return generate_pages_pandas(N_E2E_DOCS, seed=SEED)


@pytest.fixture(scope="session")
def warehouse(spark, tmp_path_factory):
    """dt-partitioned parquet pages table."""
    root = str(tmp_path_factory.mktemp("warehouse"))
    path = os.path.join(root, "pages")
    write_pages_warehouse(spark, path, N_E2E_DOCS, seed=SEED)
    return path


@pytest.fixture()
def out_root():
    d = tempfile.mkdtemp(prefix="blr_out_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
