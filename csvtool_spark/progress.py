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


class ProgressReporter:
    """The reference's 1-second scan-progress ticker
    (/root/reference/utils.go:803-834: a goroutine posts rows-read messages
    every second), mapped to Spark: a daemon thread polls the
    SparkStatusTracker and invokes ``callback(stage_id, completed_tasks,
    total_tasks)`` for every active stage, once per ``interval`` seconds.

    Polling the status tracker is deliberate — it is stable public API,
    while registering a JVM SparkListener from Python needs a py4j
    callback server (fragile in embedded drivers). Task counts are the
    right progress unit for Spark: bytes/rows live per-task and reach the
    driver only at stage end.

        rep = ProgressReporter(spark, lambda s, c, t: print(f"{c}/{t}"))
        with rep:
            df.collect()
    """

    def __init__(
        self,
        spark: SparkSession,
        callback: Callable[[int, int, int], None],
        interval: float = 1.0,
    ):
        self.spark = spark
        self.callback = callback
        self.interval = interval
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _poll(self) -> None:
        tracker = self.spark.sparkContext.statusTracker()
        while not self._stop.wait(self.interval):
            for sid in tracker.getActiveStageIds():
                info = tracker.getStageInfo(sid)
                if info is not None:
                    self.callback(sid, info.numCompletedTasks, info.numTasks)

    def __enter__(self) -> "ProgressReporter":
        self._thread = threading.Thread(target=self._poll, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(5)


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
