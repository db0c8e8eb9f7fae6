"""Golden-output test harness — engine analog of mrtest/testing.go.

The reference harness pipes input through Mapper -> byte-line-sort (the
shuffle model) -> Reducer in-process, then byte-compares to a golden string
(mrtest/testing.go:55-123). Here the pipeline runs on a real local
SparkSession (so the test exercises the actual execution path, not a
simulator), and the output is rendered to ``k\\tv`` lines sorted
byte-lexicographically by serialized key — the reference's output order
(SURVEY.md §1.3) — before comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gomrjob_spark.pipeline import Pipeline, Step
from gomrjob_spark.protocols import format_kv_lines


def lines_df(spark: SparkSession, text: str) -> DataFrame:
    """One-column DataFrame[value: string] from newline-separated text,
    skipping blank lines (RawInputProtocol skips empties, protocol.go:57-60)."""
    rows = [(ln,) for ln in text.split("\n") if ln.strip()]
    return spark.createDataFrame(rows, "value string")


def collect_kv_output(result: DataFrame) -> str:
    """Render a key/value result to byte-sorted ``k\\tv`` text (the shape
    golden files use, example/example_mr_test.go:26-29)."""
    out = format_kv_lines(result).orderBy(F.col("value"))
    return "".join(r.value + "\n" for r in out.collect())


def run_steps(spark: SparkSession, steps: list[Step] | Pipeline, input_text: str) -> str:
    """TestMapReduceSteps analog: feed text lines through the pipeline,
    return the golden-comparable output text."""
    pipe = steps if isinstance(steps, Pipeline) else Pipeline(steps=list(steps))
    return collect_kv_output(pipe.run(lines_df(spark, input_text)))


def assert_golden(spark: SparkSession, steps: list[Step] | Pipeline, input_text: str, golden: str) -> None:
    """Byte-compare pipeline output to a golden string after whitespace
    trim (mrtest/testing.go:111-123 semantics)."""
    got = run_steps(spark, steps, input_text).strip()
    want = golden.strip()
    assert got == want, f"golden mismatch:\n--- got ---\n{got}\n--- want ---\n{want}"
