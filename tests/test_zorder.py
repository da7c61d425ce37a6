"""Z-order layout: the Morton key's SQL and Python forms agree, and a
z-sorted parquet file's row-group stats prune a 2-D box predicate
strictly better than a time-sorted file of the same rows — the measured
claim behind using the curve as a clustering key at scale."""

import pyarrow as pa
import pyarrow.parquet as pq

from edgelake_spark.functions.zorder import zorder_py, zorder16_expr


def test_sql_matches_python(spark):
    rows = [(x, y) for x in (0, 1, 51, 150, 65535) for y in (0, 204, 720, 65535)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    df.createOrReplaceTempView("__zt")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in spark.sql(
            f"SELECT x, y, CAST({zorder16_expr('spark', 'x', 'y')} AS BIGINT) AS z FROM __zt"
        ).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == zorder_py(x, y), (x, y)


def test_zsorted_rowgroups_prune_2d_box(spark, tmp_path):
    """Write the same (user, hour, value) rows time-sorted and z-sorted
    with equal row-group sizes; for a box predicate on BOTH dims, count
    row groups whose min/max stats overlap the box. The z layout must
    admit strictly fewer candidate groups (and both must admit the same
    matching rows, trivially, since stats are conservative)."""
    import random

    rnd = random.Random(11)
    n, groups = 40_000, 40
    rows = [
        {"user": rnd.randrange(0, 1024), "hour": rnd.randrange(0, 1024)}
        for _ in range(n)
    ]
    for r in rows:
        r["z"] = zorder_py(r["user"], r["hour"])

    def write(path, key):
        ordered = sorted(rows, key=key)
        t = pa.table(
            {
                "user": [r["user"] for r in ordered],
                "hour": [r["hour"] for r in ordered],
            }
        )
        pq.write_table(t, path, row_group_size=n // groups)

    tpath = str(tmp_path / "time.parquet")
    zpath = str(tmp_path / "z.parquet")
    write(tpath, key=lambda r: (r["hour"], r["user"]))
    write(zpath, key=lambda r: r["z"])

    # 2-D box: a 1/8 x 1/8 window in each dimension
    ux, hx = (256, 383), (512, 639)

    def candidates(path):
        md = pq.ParquetFile(path).metadata
        hits = 0
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            stats = {
                rg.column(i).path_in_schema: rg.column(i).statistics
                for i in range(rg.num_columns)
            }
            su, sh = stats["user"], stats["hour"]
            if (
                su.min <= ux[1]
                and su.max >= ux[0]
                and sh.min <= hx[1]
                and sh.max >= hx[0]
            ):
                hits += 1
        return hits

    t_hits, z_hits = candidates(tpath), candidates(zpath)
    # time-sorted: the hour range prunes, but every surviving group
    # spans all users → user bounds never help. z-sorted: groups are
    # rectangles, both dimensions prune.
    assert z_hits < t_hits, (z_hits, t_hits)
    assert z_hits <= t_hits // 2, (z_hits, t_hits)
