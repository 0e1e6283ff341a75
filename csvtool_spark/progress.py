"""Cancellation & progress — the Spark mapping of the reference's control
plumbing (SURVEY.md §3: per-row ``stop`` flag checks → cancelJobGroup;
1-second progress ticker → listener/status APIs).
"""

from __future__ import annotations

import threading
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


class CancellableRun:
    """Run an action under a job group so it can be cancelled mid-flight.

        run = CancellableRun(spark)
        t = threading.Thread(target=lambda: run(df.count))
        ...
        run.cancel()        # ≈ the reference's stop flag (evaluator.go:79-82)
    """

    def __init__(self, spark: SparkSession, description: str = "csvtool query"):
        self.spark = spark
        self.group = f"csvtool-{uuid.uuid4().hex[:12]}"
        self.description = description

    def __call__(self, action: Callable):
        sc = self.spark.sparkContext
        sc.setJobGroup(self.group, self.description, interruptOnCancel=True)
        try:
            return action()
        finally:
            sc.setJobGroup("", "")

    def cancel(self) -> None:
        self.spark.sparkContext.cancelJobGroup(self.group)


def run_with_timeout(spark: SparkSession, df: DataFrame, seconds: float):
    """Collect with a wall-clock budget; cancels the job group on timeout
    and raises TimeoutError."""
    run = CancellableRun(spark, "timed query")
    out: list = []
    err: list = []

    def work():
        try:
            out.append(run(df.collect))
        except Exception as e:  # noqa: BLE001 — surfaced to caller below
            err.append(e)

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(seconds)
    if t.is_alive():
        run.cancel()
        t.join(10)
        raise TimeoutError(f"query exceeded {seconds}s and was cancelled")
    if err:
        raise err[0]
    return out[0]
