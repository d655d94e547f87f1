from __future__ import annotations

import os

import duckdb
import pytest

SF_DIR = os.environ.get("SEISDB_TEST_SF_DIR", "/root/testdata/sf0.01")
SMOKE_SF_DIR = "/root/testdata/sf0.001"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    from seisdb_spark.session import get_spark

    spark = get_spark(app_name="seisdb-tests")
    yield spark
    spark.stop()


NSPEC = 3
NPROCS = 2


@pytest.fixture(scope="session")
def fixture_meta(tmp_path_factory):
    from seisdb_spark.pipeline import generate_fixture

    root = str(tmp_path_factory.mktemp("specfem_fixture"))
    return generate_fixture(root, nprocs=NPROCS, nspec=NSPEC)


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()
