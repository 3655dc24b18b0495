"""Experiment definitions: parse `algos.yaml` into flat run descriptions.

Rebuild of reference definitions.py:16-168.  The YAML schema is kept
compatible (hardware tier, per-task booleans, module/constructor wiring,
run-groups with fnmatch dataset patterns, `args` and `query-args` lists),
with two changes:

- `docker-tag` is optional and ignored for execution: process isolation is
  subprocess-based (see runner.py), not Docker-based, because TPU pods run
  one experiment at a time on bare hosts.
- A new `hardware: TPU` tier joins CPU and GPU.
"""

from __future__ import annotations

import dataclasses
import fnmatch
import importlib
from enum import Enum
from typing import Any, Dict, List, Optional

import yaml


@dataclasses.dataclass(frozen=True)
class Definition:
    """One fully-specified experiment: a constructor + arguments."""

    algorithm: str                      # entry name in algos.yaml
    module: str                         # python module path
    constructor: str                    # class name inside the module
    arguments: Dict[str, Any]           # constructor kwargs
    query_argument_groups: List[Dict[str, Any]]  # set_query_arguments kwargs
    docker_tag: Optional[str] = None    # accepted for compat, unused

    def replace(self, **kwargs) -> "Definition":
        return dataclasses.replace(self, **kwargs)


def instantiate_algorithm(definition: Definition):
    """Import the module and call the constructor with the stored kwargs."""
    module = importlib.import_module(definition.module)
    constructor = getattr(module, definition.constructor)
    return constructor(**definition.arguments)


class InstantiationStatus(Enum):
    AVAILABLE = 0
    NO_CONSTRUCTOR = 1
    NO_MODULE = 2


def algorithm_status(definition: Definition) -> InstantiationStatus:
    """Check that a definition's module/constructor can be loaded."""
    try:
        module = importlib.import_module(definition.module)
    except ImportError:
        return InstantiationStatus.NO_MODULE
    if hasattr(module, definition.constructor):
        return InstantiationStatus.AVAILABLE
    return InstantiationStatus.NO_CONSTRUCTOR


def _load_yaml(definition_file: str) -> Dict[str, Any]:
    with open(definition_file, "r") as f:
        return yaml.safe_load(f)


def list_algorithms(definition_file: str) -> None:
    """Print a per-entry overview of supported tasks."""
    entries = _load_yaml(definition_file)
    print("The following algorithms are supported...")
    for tag, algo in entries.items():
        print(f"\t{tag} for the tasks:")
        for task in ("product", "attention", "solver"):
            print(f"\t\t{task}:   {algo.get(task, False)}")


def get_definitions(
    definition_file: str = "algos.yaml",
    dimension: int = 3,
    dataset: str = "product-sphere-D3-E1-M1000-N1000-inverse-distance",
    task: str = "product",
    hardware: str = "CPU",
    kernel: str = "gaussian",
    normalize_rows: bool = False,
    run_disabled: bool = False,
) -> List[Definition]:
    """Expand algos.yaml into the list of experiments matching a dataset.

    Filtering rules (reference definitions.py:107-139):
    - skip `disabled: true` entries unless run_disabled,
    - skip entries whose `hardware` tier doesn't match,
    - skip entries that don't declare support for the dataset's task
      (per-task booleans `product` / `attention` / `solver`),
    - within an entry, keep only run-groups with an fnmatch pattern
      matching the dataset name.

    Each kept (entry, run-group, args) triple becomes one Definition whose
    constructor kwargs are `args` merged over the dataset-derived base
    {kernel, dimension, normalize_rows}.
    """
    entries = _load_yaml(definition_file)
    definitions: List[Definition] = []

    for name, algo in entries.items():
        if algo.get("disabled", False) and not run_disabled:
            continue
        # Tier as CAPABILITY: accelerator machines also have a host CPU,
        # so CPU entries run everywhere — a single TPU-host sweep then
        # produces the full CPU-vs-TPU Pareto story (the reference's
        # strict equality, definitions.py:112, forces one sweep per
        # machine class instead).
        if algo.get("hardware", "CPU") not in ("CPU", hardware):
            continue
        if not algo.get(task, False):
            continue

        for key in ("module", "constructor"):
            if key not in algo:
                raise ValueError(
                    f"algorithm {name!r} does not define a {key!r} property")

        for group_name, group in algo.get("run-groups", {}).items():
            if "datasets" not in group:
                raise ValueError(
                    f'The field "datasets" is missing for run-group '
                    f"{group_name!r} of algo {name!r}.")
            if not any(fnmatch.fnmatch(dataset, pattern)
                       for pattern in group["datasets"]):
                continue

            all_args = group.get("args", [{}])
            all_query_args = group.get("query-args", [{}])

            for args in all_args:
                merged = {
                    "kernel": kernel,
                    "dimension": dimension,
                    "normalize_rows": normalize_rows,
                    **args,
                }
                definitions.append(Definition(
                    algorithm=name,
                    module=algo["module"],
                    constructor=algo["constructor"],
                    arguments=merged,
                    query_argument_groups=list(all_query_args),
                    docker_tag=algo.get("docker-tag"),
                ))

    return definitions
