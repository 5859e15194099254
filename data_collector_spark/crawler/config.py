"""Pipeline configuration — the reference's layered YAML settings.

The reference selects which tasks run and how from YAML
(/root/reference/configuration/base.yaml:9-46, loaded by
src/configuration.rs:125-157) and *panics* on invalid graphs
(src/dag_schedule/schedule.rs:118-138, SURVEY.md D3/D4/D8). Here the
"graph" is the round loop, so validation is config-shape checking:
unknown keys, non-positive bounds, and missing inputs fail fast before
any Spark job runs.

Example (YAML or JSON):

    crawl:
      max_rounds: 5
      default_budget: 2
      retry_max: 2
      recrawl_ttl_rounds: 0
    inputs:
      pages: /data/pages          # required
      seeds: /data/seeds          # required (parquet: url, priority)
      robots: /data/robots        # optional
      budgets: /data/budgets      # optional
    workdir: /data/crawl_wd       # required
"""

from __future__ import annotations

import dataclasses
import json
import os

from data_collector_spark.crawler.driver import CrawlConfig

_CRAWL_KEYS = {f.name for f in dataclasses.fields(CrawlConfig)}
_INPUT_KEYS = {"pages", "seeds", "robots", "budgets"}


class PipelineConfigError(ValueError):
    pass


def load_pipeline(path: str) -> tuple[CrawlConfig, dict[str, str], str]:
    """-> (CrawlConfig, input paths, workdir). Raises on any invalid shape."""
    with open(path) as f:
        raw = f.read()
    if path.endswith((".yaml", ".yml")):
        import yaml

        doc = yaml.safe_load(raw)
    else:
        doc = json.loads(raw)
    return validate_pipeline(doc)


def validate_pipeline(doc: dict) -> tuple[CrawlConfig, dict[str, str], str]:
    if not isinstance(doc, dict):
        raise PipelineConfigError("config root must be a mapping")
    unknown = set(doc) - {"crawl", "inputs", "workdir"}
    if unknown:
        raise PipelineConfigError(f"unknown top-level keys: {sorted(unknown)}")

    crawl = doc.get("crawl", {}) or {}
    bad = set(crawl) - _CRAWL_KEYS
    if bad:
        raise PipelineConfigError(f"unknown crawl keys: {sorted(bad)} (valid: {sorted(_CRAWL_KEYS)})")
    cfg = CrawlConfig(**crawl)
    if cfg.max_rounds < 1:
        raise PipelineConfigError("crawl.max_rounds must be >= 1")
    if cfg.default_budget < 1:
        raise PipelineConfigError("crawl.default_budget must be >= 1")
    if cfg.retry_max < 0 or cfg.recrawl_ttl_rounds < 0:
        raise PipelineConfigError("retry_max/recrawl_ttl_rounds must be >= 0")

    inputs = doc.get("inputs", {}) or {}
    bad = set(inputs) - _INPUT_KEYS
    if bad:
        raise PipelineConfigError(f"unknown input keys: {sorted(bad)}")
    for req in ("pages", "seeds"):
        if req not in inputs:
            raise PipelineConfigError(f"inputs.{req} is required")
        if not os.path.exists(inputs[req]):
            raise PipelineConfigError(f"inputs.{req} path does not exist: {inputs[req]}")

    workdir = doc.get("workdir")
    if not workdir:
        raise PipelineConfigError("workdir is required")
    return cfg, inputs, workdir
