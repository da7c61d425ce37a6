import pytest


@pytest.fixture(scope="session")
def spark():
    from edgelake_spark import get_spark

    s = get_spark(app_name="edgelake-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()


SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def duck_views(duck):
    from edgelake_spark.catalog import TESTDATA_TABLES

    for t in TESTDATA_TABLES:
        duck.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR_MED}/{t}.parquet')"
        )
    return duck
