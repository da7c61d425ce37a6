"""Connected components for dedup clustering: BOTH branches of the
hybrid algorithm (driver union-find / distributed min-label + pointer
jumping) verified on adversarial graphs against a DuckDB recursive-CTE
oracle and each other. A 300-node path forces real pointer jumping:
plain min-label propagation would need 300 rounds, the 20-round cap
passes only because label := label[label] halves the diameter each
round."""

from __future__ import annotations

import random

import duckdb
import pytest

from edgelake_spark.functions.dedup import connected_components


def _synthetic_edges():
    """Path 0..300, star 1000 + 20 leaves, pairs, isolated 2-cycles —
    shuffled so input order carries no information."""
    edges = [(i, i + 1) for i in range(300)]  # diameter-300 path
    edges += [(1000, 1000 + i) for i in range(1, 21)]  # star
    edges += [(2000 + 2 * i, 2001 + 2 * i) for i in range(10)]  # pairs
    edges += [(305, 300)]  # extra edge re-entering the path
    rng = random.Random(7)
    rng.shuffle(edges)
    # randomize orientation too
    return [(b, a) if rng.random() < 0.5 else (a, b) for a, b in edges]


def _duck_cc_oracle(edges):
    con = duckdb.connect()
    con.execute("CREATE TABLE pairs(id1 BIGINT, id2 BIGINT)")
    con.executemany("INSERT INTO pairs VALUES (?, ?)", edges)
    rows = con.execute(
        """
        WITH RECURSIVE edges AS (
          SELECT id1 AS a, id2 AS b FROM pairs
          UNION
          SELECT id2, id1 FROM pairs
        ),
        reach(a, b) AS (
          SELECT a, b FROM edges
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a WHERE e.b != r.a
        )
        SELECT a AS doc_id, least(a, min(b)) AS component_id
        FROM reach GROUP BY a ORDER BY doc_id
        """
    ).fetchall()
    con.close()
    return rows


@pytest.fixture(scope="module")
def edge_df(spark):
    return spark.createDataFrame(_synthetic_edges(), "id1 long, id2 long")


def test_driver_branch_matches_oracle(spark, edge_df):
    got = [(r.doc_id, r.component_id) for r in connected_components(edge_df).collect()]
    assert got == _duck_cc_oracle(_synthetic_edges())


def test_distributed_branch_matches_oracle_and_driver(spark, edge_df):
    # driver_threshold=0 forces the min-label + pointer-jumping loop
    dist = [
        (r.doc_id, r.component_id)
        for r in connected_components(edge_df, driver_threshold=0).collect()
    ]
    assert dist == _duck_cc_oracle(_synthetic_edges())
    drv = [(r.doc_id, r.component_id) for r in connected_components(edge_df).collect()]
    assert dist == drv
    # sanity on the component structure itself
    comp = dict(dist)
    assert all(comp[i] == 0 for i in range(301)) and comp[305] == 0  # path + re-entry
    assert all(comp[1000 + i] == 1000 for i in range(21))  # star
    assert all(comp[2000 + 2 * i + k] == 2000 + 2 * i for i in range(10) for k in (0, 1))


def test_distributed_branch_raises_without_fixpoint(spark, edge_df):
    # one round cannot collapse a diameter-300 path: convergence is
    # checked, not assumed (no silent 12-round-cap answers)
    with pytest.raises(RuntimeError, match="fixpoint"):
        connected_components(edge_df, driver_threshold=0, max_rounds=1)


def test_distributed_branch_on_real_lsh_pairs(spark):
    """The sf0.001 LSH candidate pairs through the distributed branch
    must agree with the driver branch (the gate path)."""
    from edgelake_spark.queries import _run_minhash_pairs
    from tests.conftest import SF_DIR

    pairs = _run_minhash_pairs(spark, SF_DIR).select("id1", "id2").localCheckpoint()
    drv = [(r.doc_id, r.component_id) for r in connected_components(pairs).collect()]
    dist = [
        (r.doc_id, r.component_id)
        for r in connected_components(pairs, driver_threshold=0).collect()
    ]
    assert drv == dist and len(drv) > 0


def test_doc_artifact_sweep_replaces_stale_states(spark, tmp_path):
    """A version (or dataset-state) change rebuilds the artifact and
    sweeps the stale sibling of the same source; other kinds and other
    sources are untouched."""
    import os
    import shutil

    from edgelake_spark.queries import _doc_artifact_path, _doc_artifact_view

    src = tmp_path / "ds"
    src.mkdir()
    shutil.copy("/root/testdata/sf0.001/documents.parquet",
                src / "documents.parquet")

    build = lambda: spark.range(3).selectExpr("id AS doc_id")
    p1 = _doc_artifact_path(str(src), "t_art", "v1")
    _doc_artifact_view(spark, str(src), "t_art", "v1", build, "__t_art")
    assert os.path.exists(os.path.join(p1, "_SUCCESS"))

    # semantics change -> new state tag; old state swept on build
    p2 = _doc_artifact_path(str(src), "t_art", "v2")
    assert p2 != p1
    _doc_artifact_view(spark, str(src), "t_art", "v2", build, "__t_art")
    assert os.path.exists(os.path.join(p2, "_SUCCESS"))
    assert not os.path.exists(p1)

    # a different KIND of the same source survives the sweep
    p3 = _doc_artifact_path(str(src), "t_other", "v1")
    _doc_artifact_view(spark, str(src), "t_other", "v1", build, "__t_other")
    assert os.path.exists(os.path.join(p3, "_SUCCESS"))
    _doc_artifact_view(spark, str(src), "t_art", "v3", build, "__t_art")
    assert os.path.exists(os.path.join(p3, "_SUCCESS"))  # untouched
    assert not os.path.exists(p2)
    for p in (_doc_artifact_path(str(src), "t_art", "v3"), p3):
        shutil.rmtree(p, ignore_errors=True)  # keep spark-warehouse clean
