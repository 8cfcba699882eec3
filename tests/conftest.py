import os
import shutil

import pytest

from matdb_spark.session import get_spark

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="matdb_spark_tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    # the shared session must not persist tmp-dir stores into the
    # repo-level warehouse catalog (they die with pytest's tmp dirs);
    # the dedicated persistence tests opt back in on their own
    # sessions with an explicit sidecar path
    s.conf.set("spark.matdb.catalog", "off")
    yield s


@pytest.fixture()
def tmp_db_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("db")
    yield str(d)
    shutil.rmtree(d, ignore_errors=True)


def sf_dir(sf: str = "sf0.001") -> str:
    return f"/root/testdata/{sf}"
