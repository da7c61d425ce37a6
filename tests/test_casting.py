"""::casting chain behavior against the reference's Python semantics
(utils_columns.py:1746 cast_to_float, :1830 cast_to_just, :1856
cast_with_format, :1876 cast_by_replace, :1902 ret_time_diff)."""

import pytest

from pyspark.sql import functions as F

from edgelake_spark.dialect.casting import CastingError, apply_castings, casting_to_column


def one(spark, value_expr: str, casting: str):
    df = spark.sql(f"SELECT {value_expr} AS v")
    return df.select(casting_to_column(F.col("v"), casting).alias("out")).collect()[0].out


def test_float_digits(spark):
    assert one(spark, "1.23456", "float(2)") == 1.23
    assert one(spark, "10.0", "float(3)") == 10.0
    assert one(spark, "'2.5'", "float(1)") == 2.5  # string input coerced


def test_float_format_thousands(spark):
    # float(%n) = python "{:,.nf}" (thousands separators)
    assert one(spark, "1234567.891", "float(%2)") == "1,234,567.89"


def test_int_str(spark):
    assert one(spark, "3.7", "int") == 3  # truncation like python int()
    assert one(spark, "-3.7", "int") == -3
    assert one(spark, "42", "str") == "42"


def test_just_pad_and_truncate(spark):
    assert one(spark, "'abc'", "ljust(5)") == "abc  "
    assert one(spark, "'abcdef'", "ljust(4)") == "abcd"  # keep left
    assert one(spark, "'abc'", "rjust(5)") == "  abc"
    assert one(spark, "'abcdef'", "rjust(4)") == "cdef"  # keep right


def test_format_grouping(spark):
    assert one(spark, "1234567", "format(':,')") == "1,234,567"


def test_datetime_strftime(spark):
    assert (
        one(spark, "timestamp'2024-03-05 07:08:09'", "datetime('%Y/%m/%d %H:%M')")
        == "2024/03/05 07:08"
    )


def test_timezone_casting(spark):
    # January → PST = UTC-8
    assert one(spark, "timestamp'2024-01-15 20:00:00'", "timezone('pt')") == (
        "2024-01-15 12:00:00"
    )


def test_replace_first_occurrence_only(spark):
    assert one(spark, "'a-b-c'", "replace(- by _)") == "a_b-c"
    assert one(spark, "'abc'", "replace(x by y)") == "abc"


def test_timediff_format(spark):
    out = one(spark, "timestamp'2024-01-01 10:00:00'", "timediff(timestamp'2024-01-01 07:30:15')")
    assert out == "02:29:45.0"


def test_strip(spark):
    assert one(spark, "'  x  '", "lstrip") == "x  "
    assert one(spark, "'  x  '", "rstrip") == "  x"


def test_chained_castings(spark):
    df = spark.sql("SELECT 1234.5678 AS v")
    out = apply_castings(df, [("v", ["float(2)", "format(':,')"])]).collect()[0].v
    assert out == "1,235"  # format(':,') = 0 decimals of the rounded value


def test_unknown_casting_rejected(spark):
    with pytest.raises(CastingError):
        one(spark, "1", "sideways(3)")


def test_timezone_applies_before_casting(spark):
    """timezone=pt must shift a timestamp even when a ::datetime casting
    formats it to string — the reference converts the zone first, then
    casts (utils_columns.py:1660 change_columns_values)."""
    from datetime import datetime

    from edgelake_spark.engine import EdgeLakeEngine
    from tests.conftest import SF_DIR

    eng = EdgeLakeEngine(spark, SF_DIR, now=datetime(2024, 2, 1))
    utc = eng.run(
        'sql d "select ts::datetime(\'%Y-%m-%d %H:%M\') as t from events order by ts limit 1"'
    ).collect()[0].t
    pt = eng.run(
        'sql d timezone = pt "select ts::datetime(\'%Y-%m-%d %H:%M\') as t from events order by ts limit 1"'
    ).collect()[0].t
    # January → PST = UTC-8
    assert utc == "2024-01-01 00:09" and pt == "2023-12-31 16:09"


def test_function_casting_sql_expr(spark):
    """::function(<sql expr>) with [col] placeholders compiles JVM-side
    (the Spark-safe stand-in for the reference's per-row Python eval)."""
    from datetime import datetime

    from edgelake_spark.engine import EdgeLakeEngine
    from tests.conftest import SF_DIR

    eng = EdgeLakeEngine(spark, SF_DIR, now=datetime(2024, 2, 1))
    rows = eng.run(
        'sql d "select event_id, value::function(round([value] * 2, 1)) as value '
        'from events order by event_id limit 3"'
    ).collect()
    base = eng.run(
        'sql d "select event_id, value from events order by event_id limit 3"'
    ).collect()
    assert [r.value for r in rows] == [round(r.value * 2, 1) for r in base]
