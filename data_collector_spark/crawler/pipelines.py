"""Concurrent pipeline execution — the reference's DAG scheduler proper.

The reference builds a task DAG, validates it (duplicate names, missing
dependencies, cycles -> panic, /root/reference/src/dag_schedule/
schedule.rs:118-138) and Kahn-executes independent branches concurrently
(schedule.rs:236-296, tokio tasks). One crawl pipeline is a driver loop
(driver.py); this module is the layer above: N independent pipelines (or
any driver-side tasks) run as a validated task graph, with ready tasks
submitted to a thread pool. Spark supports concurrent job submission from
multiple driver threads — each task runs its Spark actions in its own
scheduler pool so long tasks don't starve short ones.

Tasks here are DRIVER-side units (a whole crawl, a dedup job, a report);
inside each task, parallelism is Spark's. That split mirrors the
reference, where a task is a collector/stager run and parallelism inside
it belongs to the runtime.
"""

from __future__ import annotations

import threading
import time
from collections.abc import Callable
from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor, wait
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession


class GraphValidationError(ValueError):
    """The reference panics on invalid graphs (schedule.rs:118-138)."""


@dataclass(frozen=True)
class Task:
    name: str
    fn: Callable[[SparkSession], Any]
    deps: tuple[str, ...] = ()


@dataclass
class TaskResult:
    name: str
    ok: bool
    value: Any = None
    error: str | None = None
    skipped: bool = False  # an upstream dependency failed


@dataclass
class TaskGraph:
    tasks: list[Task] = field(default_factory=list)

    def add(self, name: str, fn: Callable[[SparkSession], Any], deps: tuple[str, ...] = ()) -> "TaskGraph":
        self.tasks.append(Task(name, fn, tuple(deps)))
        return self

    # ---- D3/D4 validation ------------------------------------------------
    def validate(self) -> None:
        names = [t.name for t in self.tasks]
        dupes = {n for n in names if names.count(n) > 1}
        if dupes:
            raise GraphValidationError(f"duplicate task names: {sorted(dupes)}")
        known = set(names)
        for t in self.tasks:
            missing = set(t.deps) - known
            if missing:
                raise GraphValidationError(
                    f"task {t.name!r} depends on unknown tasks: {sorted(missing)}"
                )
        # Kahn cycle check (schedule.rs:106-138 builds the same indegrees)
        indeg = {t.name: len(set(t.deps)) for t in self.tasks}
        out: dict[str, list[str]] = {n: [] for n in known}
        for t in self.tasks:
            for d in set(t.deps):
                out[d].append(t.name)
        ready = [n for n, d in indeg.items() if d == 0]
        seen = 0
        while ready:
            n = ready.pop()
            seen += 1
            for m in out[n]:
                indeg[m] -= 1
                if indeg[m] == 0:
                    ready.append(m)
        if seen != len(self.tasks):
            cyc = sorted(n for n, d in indeg.items() if d > 0)
            raise GraphValidationError(f"dependency cycle involving: {cyc}")

    # ---- D5 Kahn execution with concurrent ready set ----------------------
    def run(
        self,
        spark: SparkSession,
        max_workers: int = 4,
        fail_fast: bool = False,
        events=None,
        run_downstream_on_error: bool = False,
    ) -> dict[str, TaskResult]:
        """Execute all tasks; independent ready tasks run concurrently.

        On task failure the default marks its transitive dependents
        skipped — a deliberate deviation from the reference, which sends
        outgoing edges on failure too, so downstream stagers run on
        PARTIAL data (/root/reference/src/dag_schedule/task.rs:209-221).
        ``run_downstream_on_error=True`` restores the reference semantics:
        dependents are released and run even when an upstream failed (its
        result value is simply absent). Either way the failure is recorded
        and re-raised after the graph drains (unless fail_fast).

        ``events``: optional telemetry.EventLog — each task runs in a
        task_start/task_end/task_failed span (the reference's instrumented
        task execution, utils/telemetry.rs).
        """
        self.validate()
        by_name = {t.name: t for t in self.tasks}
        indeg = {t.name: len(set(t.deps)) for t in self.tasks}
        out: dict[str, list[str]] = {t.name: [] for t in self.tasks}
        for t in self.tasks:
            for d in set(t.deps):
                out[d].append(t.name)
        results: dict[str, TaskResult] = {}
        lock = threading.Lock()

        def run_one(task: Task) -> TaskResult:
            # per-task scheduler pool: concurrent crawls share executors
            # fairly instead of queuing whole job chains FIFO
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", task.name)
            if events is not None:
                events.emit("task_start", task.name, deps=list(task.deps))
            t0 = time.monotonic()
            try:
                res = TaskResult(task.name, ok=True, value=task.fn(spark))
            except Exception as e:  # noqa: BLE001 — recorded, re-raised at end
                res = TaskResult(task.name, ok=False, error=f"{type(e).__name__}: {e}")
            finally:
                spark.sparkContext.setLocalProperty("spark.scheduler.pool", None)
            if events is not None:
                events.emit(
                    "task_end" if res.ok else "task_failed", task.name,
                    duration_sec=round(time.monotonic() - t0, 3), error=res.error,
                )
            return res

        def mark_skipped(name: str) -> None:
            for dep in out[name]:
                if dep not in results:
                    results[dep] = TaskResult(dep, ok=False, skipped=True,
                                              error=f"upstream {name!r} failed")
                    mark_skipped(dep)

        ready = [by_name[n] for n, d in indeg.items() if d == 0]
        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            futures = {pool.submit(run_one, t): t for t in ready}
            while futures:
                done, _ = wait(futures, return_when=FIRST_COMPLETED)
                for fut in done:
                    task = futures.pop(fut)
                    res = fut.result()
                    with lock:
                        results[task.name] = res
                        release = res.ok or run_downstream_on_error
                        if not res.ok and not release:
                            mark_skipped(task.name)
                        if not res.ok and fail_fast:
                            for f in futures:
                                f.cancel()
                            futures = {}
                            break
                        if release:
                            for dep_name in out[task.name]:
                                if dep_name in results:
                                    continue
                                indeg[dep_name] -= 1
                                if indeg[dep_name] == 0:
                                    futures[pool.submit(run_one, by_name[dep_name])] = by_name[dep_name]
        failed = [r for r in results.values() if not r.ok and not r.skipped]
        if failed:
            raise RuntimeError(
                "tasks failed: " + "; ".join(f"{r.name}: {r.error}" for r in failed)
            )
        return results
