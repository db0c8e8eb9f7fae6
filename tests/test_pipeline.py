"""Pipeline/Step API tests, incl. the reference example job's golden output.

Golden fixture source: /root/reference/example/example_mr_test.go:14-31
(6 JSON lines -> exact 3-line `"key"\tcount` output).
"""

from __future__ import annotations

import pandas as pd
import pytest

from gomrjob_spark.counters import Counters
from gomrjob_spark.pipeline import COUNT, SUM, Pipeline, Step
from gomrjob_spark.plans.mr import field_count_mapper
from gomrjob_spark.testing import assert_golden, lines_df, run_steps

EXAMPLE_INPUT = """{"key_field":"z"}
{"key_field":"a"}
{"key_field":"another"}
{"key_field":"z"}
{"key_field":"z"}
{"another_key":"a"}
"""

EXAMPLE_GOLDEN = '"another_key"\t1\n"key_field"\t5\n"lines_read"\t6\n'


def test_example_job_golden(spark):
    """The reference's end-to-end golden test, byte-for-byte."""
    assert_golden(
        spark,
        [Step(mapper=field_count_mapper, reducer=SUM)],
        EXAMPLE_INPUT,
        EXAMPLE_GOLDEN,
    )


def test_example_job_skips_bad_json(spark):
    out = run_steps(
        spark,
        [Step(mapper=field_count_mapper, reducer=SUM)],
        EXAMPLE_INPUT + "not-json-data\n",
    )
    assert out == EXAMPLE_GOLDEN  # bad line skipped, not counted


def test_identity_mapper_default(spark):
    """Step without a mapper passes rows through (runner.go:281-287)."""
    kv = spark.createDataFrame([("a", "1"), ("a", "2"), ("b", "3")], "key string, value string")
    got = Pipeline(steps=[Step(reducer=SUM)]).run(kv).orderBy("key").collect()
    assert [(r.key, r.value) for r in got] == [("a", 3), ("b", 3)]


def test_sum_skips_non_int_values(spark):
    """Sum parity (protocol.go:344-346): non-int values skipped."""
    kv = spark.createDataFrame(
        [("a", "1"), ("a", "not-a-number"), ("a", "2"), ("b", "1.5")],
        "key string, value string",
    )
    got = Pipeline(steps=[Step(reducer=SUM)]).run(kv).orderBy("key").collect()
    assert [(r.key, r.value) for r in got] == [("a", 3), ("b", None)]


def test_count_builtin(spark):
    kv = spark.createDataFrame([("a", "x"), ("a", "y"), ("b", "z")], "key string, value string")
    got = Pipeline(steps=[Step(reducer=COUNT)]).run(kv).orderBy("key").collect()
    assert [(r.key, r.value) for r in got] == [("a", 2), ("b", 1)]


def test_multistep_chaining(spark):
    """Two steps chain without materialization (runner.go:352-356 analog)."""

    def rekey(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"key": ["total"] * len(pdf), "value": pdf["value"].astype(str)})

    kv = spark.createDataFrame(
        [("a", "1"), ("a", "1"), ("b", "1"), ("c", "1")], "key string, value string"
    )
    pipe = Pipeline(steps=[Step(reducer=SUM), Step(mapper=rekey, reducer=SUM)])
    got = pipe.run(kv).collect()
    assert [(r.key, r.value) for r in got] == [("total", 4)]


def test_python_reducer_sorted_values(spark):
    """sorted_values gives the reducer the byte-sorted stream the reference
    guarantees (SURVEY.md §1.3)."""

    def first_value(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"key": [key], "value": [pdf["value"].iloc[0]]})

    kv = spark.createDataFrame(
        [("a", "z"), ("a", "m"), ("a", "b")], "key string, value string"
    ).repartition(4)
    pipe = Pipeline(
        steps=[
            Step(reducer=first_value, reduce_schema="key string, value string", sorted_values=True)
        ]
    )
    got = pipe.run(kv).collect()
    assert [(r.key, r.value) for r in got] == [("a", "b")]


def test_reducer_tasks_override(spark):
    """Per-step parallelism hint (map_reduce_step.go:19-21 analog)."""
    kv = spark.createDataFrame([("a", "1"), ("b", "2")], "key string, value string")
    pipe = Pipeline(steps=[Step(reducer=SUM, reducer_tasks=2)])
    got = pipe.run(kv).orderBy("key").collect()
    assert [(r.key, r.value) for r in got] == [("a", 1), ("b", 2)]


def test_empty_pipeline_raises(spark):
    with pytest.raises(ValueError):
        Pipeline().run(lines_df(spark, "x"))


def test_counters_accumulate(spark):
    """Counter analog of reporter.go:12-15 through a real distributed job."""
    counters = Counters(spark)
    acc = counters.counter("example_mr", "lines_read")

    def count_mapper(pdf: pd.DataFrame) -> pd.DataFrame:
        acc.add(len(pdf))
        return pd.DataFrame({"key": pdf["value"], "value": ["1"] * len(pdf)})

    df = lines_df(spark, "a\nb\nc\n")
    Pipeline(steps=[Step(mapper=count_mapper, reducer=SUM)]).run(df).collect()
    assert counters.value("example_mr", "lines_read") == 3
    assert counters.report() == {"example_mr.lines_read": 3}
