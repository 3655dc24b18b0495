"""Experiment orchestrator: plan, dedup, dispatch (reference main.py:74-310).

`python run.py --dataset D` loads the dataset's attrs, expands algos.yaml
into matching experiment definitions, filters out experiments whose result
files already exist (resume-at-experiment-granularity), shuffles for
thermal decorrelation, and runs them serially — in-process with `--local`,
else each in an isolated subprocess with a timeout.
"""

from __future__ import annotations

import argparse
import logging
import logging.config
import os
import random
import sys

from kmb_tpu.datasets import DATASETS, get_dataset
from kmb_tpu.definitions import (
    InstantiationStatus, algorithm_status, get_definitions, list_algorithms,
)
from kmb_tpu.results import get_result_filename, record_failure
from kmb_tpu.runner import run, run_subprocess

logger = logging.getLogger("kmb")


def positive_int(value):
    try:
        i = int(value)
    except ValueError:
        i = 0
    if i < 1:
        raise argparse.ArgumentTypeError(
            f"{value!r} is not a positive integer")
    return i


def make_parser():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument(
        "--dataset", metavar="NAME", choices=DATASETS.keys(),
        default="product-sphere-D3-E1-M1000-N1000-inverse-distance",
        help="dataset to benchmark on")
    parser.add_argument(
        "--hardware", metavar="TIER", default=None,
        choices=["CPU", "GPU", "TPU"],
        help="hardware tier of this machine (selects algos.yaml entries); "
             "default: TPU when a TPU backend is live, else CPU")
    parser.add_argument(
        "--definitions", metavar="FILE", default="algos.yaml",
        help="load algorithm definitions from FILE (relative paths fall "
             "back to the repo root when absent from the CWD)")
    parser.add_argument(
        "--algorithm", metavar="NAME", default=None,
        help="run only the named algorithm")
    parser.add_argument(
        "--exclude", metavar="NAME", action="append", default=[],
        help="skip the named algorithm (repeatable); e.g. keep a sweep "
             "moving by excluding compile-heavy entries")
    parser.add_argument(
        "--list-algorithms", action="store_true",
        help="print the names of all known algorithms and exit")
    parser.add_argument(
        "--force", action="store_true",
        help="re-run experiments whose results already exist")
    parser.add_argument(
        "--runs", metavar="COUNT", type=positive_int, default=2,
        help="repetitions per experiment; the best time is kept, so run 1 "
             "absorbs JIT/XLA compilation")
    parser.add_argument(
        "--timeout", type=int, default=2 * 600,
        help="per-experiment timeout in seconds (-1 for none)")
    parser.add_argument(
        "--local", action="store_true",
        help="run in-process instead of isolated subprocesses")
    parser.add_argument(
        "--max-n-algorithms", type=int, default=-1,
        help="cap the number of experiments (for smoke tests)")
    parser.add_argument(
        "--run-disabled", action="store_true",
        help="run algorithms marked disabled in algos.yaml")
    return parser


def plan_experiments(args):
    """Expand definitions and drop already-completed experiments."""
    if args.hardware is None:
        args.hardware = detect_hardware()
    args.definitions = resolve_definitions_path(args.definitions)
    dataset_file, dimension = get_dataset(args.dataset)
    kernel = dataset_file.attrs["kernel"]
    task = dataset_file.attrs["task"]
    normalize_rows = bool(dataset_file.attrs.get("normalize_rows", False))
    dataset_file.close()

    definitions = get_definitions(
        definition_file=args.definitions,
        dimension=dimension,
        dataset=args.dataset,
        task=task,
        hardware=args.hardware,
        kernel=kernel,
        normalize_rows=normalize_rows,
        run_disabled=args.run_disabled,
    )

    # Resume: drop query-argument groups whose result file already exists.
    filtered = []
    for definition in definitions:
        remaining = [
            qa for qa in (definition.query_argument_groups or [{}])
            if args.force or not os.path.exists(
                get_result_filename(args.dataset, definition, qa))
        ]
        if remaining:
            filtered.append(
                definition.replace(query_argument_groups=remaining))
    definitions = filtered

    # Shuffle to decorrelate slow thermal drift from algos.yaml order.
    random.shuffle(definitions)

    if args.algorithm:
        logger.info("running only %s", args.algorithm)
        definitions = [d for d in definitions
                       if d.algorithm == args.algorithm]
    if args.exclude:
        logger.info("excluding %s", ", ".join(args.exclude))
        definitions = [d for d in definitions
                       if d.algorithm not in args.exclude]

    # Importability check (the local analog of the reference's
    # docker-image availability filter, main.py:232-287):
    def importable(definition):
        status = algorithm_status(definition)
        if status == InstantiationStatus.NO_CONSTRUCTOR:
            raise RuntimeError(
                f"{definition.module} does not expose "
                f"{definition.constructor}")
        if status == InstantiationStatus.NO_MODULE:
            logger.warning("module %s could not be loaded; skipping",
                           definition.module)
            return False
        return True

    definitions = [d for d in definitions if importable(d)]

    if args.max_n_algorithms >= 0:
        definitions = definitions[: args.max_n_algorithms]
    return definitions


def detect_hardware():
    """Hardware tier of this machine: TPU if a TPU backend is live."""
    try:
        import jax
        return "TPU" if jax.default_backend() == "tpu" else "CPU"
    except Exception:
        return "CPU"


def resolve_definitions_path(path):
    """Resolve a relative definitions file against CWD, then repo root.

    The reference reads `algos.yaml` from the CWD only; resolving
    against the repo root too lets `run.py` drive from anywhere (result
    and data dirs stay CWD-relative by design).
    """
    if os.path.isabs(path) or os.path.exists(path):
        return path
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    candidate = os.path.join(repo_root, path)
    return candidate if os.path.exists(candidate) else path


def main(argv=None):
    args = make_parser().parse_args(argv)
    if args.timeout == -1:
        args.timeout = None
    if args.hardware is None:
        args.hardware = detect_hardware()
    args.definitions = resolve_definitions_path(args.definitions)

    if args.list_algorithms:
        list_algorithms(args.definitions)
        sys.exit(0)

    if os.path.exists("logging.conf"):
        logging.config.fileConfig("logging.conf")
    else:
        logging.basicConfig(
            level=logging.INFO, format="%(levelname)s:%(name)s:%(message)s")

    # Multi-host bring-up (no-op unless KMB_COORDINATOR_ADDRESS /
    # KMB_NUM_PROCESSES are set); every host plans and runs the same
    # experiments, host 0 writes the results (runner.py).
    from kmb_tpu.parallel import multihost
    if multihost.initialize():
        logger.info("Multi-host: process %d/%d, %d global devices.",
                    __import__("jax").process_index(),
                    multihost.num_hosts(), len(__import__("jax").devices()))

    definitions = plan_experiments(args)
    if not definitions:
        raise SystemExit("Nothing to run")
    logger.info("Order: %s", [d.algorithm for d in definitions])

    # Experiments run serially, one at a time, for timing fidelity
    # (the reference drains its queue with exactly one worker,
    # main.py:298-308).  One definition's failure (OOM, device fault,
    # numerical error) must not kill the sweep — log it and move on,
    # like the reference's per-job try/except (main.py:43-51).
    failures = 0
    for definition in definitions:
        reason = None
        try:
            if args.local:
                run(definition=definition, dataset=args.dataset,
                    runs=args.runs)
            else:
                reason = run_subprocess(
                    definition=definition, dataset=args.dataset,
                    runs=args.runs, timeout=args.timeout)
        except Exception as exc:
            reason = f"exception: {exc!r}"
            logger.exception("Experiment failed: %s on %s",
                             definition, args.dataset)
        if reason is not None:
            failures += 1
            for qa in definition.query_argument_groups or [{}]:
                record_failure(dataset=args.dataset, definition=definition,
                               query_arguments=qa, reason=reason)
    if failures:
        # A partially (or fully) dead sweep must be loud AND visible to
        # CI/driver scripts: nonzero exit (the reference's red logging,
        # reference runner.py:319-338, never surfaced in the exit code).
        logger.warning("%d/%d experiments failed.", failures,
                       len(definitions))
        sys.exit(1)
