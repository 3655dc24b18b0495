"""Dummy algorithms: random output of the right shape.

Harness test fixtures — they exercise the full pipeline (runner, results,
metrics, plots) without any actual math, like reference dummy_algo.py:6-37.
"""

from __future__ import annotations

import numpy as np

from kmb_tpu.algorithms.base import BaseProduct, BaseSolver


class DummyProduct(BaseProduct):
    """Returns an (N, E)-shaped standard-normal sample."""

    def prepare_data(self, *, source_points, target_points, same_points=False,
                     density_estimation=False):
        self.n_targets = len(target_points)

    def prepare_query(self, *, source_signal):
        self.n_outputs = 1 if source_signal is None else source_signal.shape[1]

    def query(self):
        self.res = np.random.randn(self.n_targets, self.n_outputs)


class SleepyProduct(DummyProduct):
    """Blocks in fit() — fixture for the runner's watchdog timeout."""

    def __init__(self, *, seconds=120.0, **kwargs):
        super().__init__(**kwargs)
        self.seconds = float(seconds)

    def fit(self):
        import time

        time.sleep(self.seconds)


class CrashyProduct(DummyProduct):
    """Raises in fit() — fixture for child-failure accounting."""

    def fit(self):
        raise RuntimeError("CrashyProduct always fails (test fixture)")


class DummySolver(BaseSolver):
    """Returns an (M, E)-shaped standard-normal sample."""

    def prepare_data(self, *, source_points):
        self.n_sources = len(source_points)

    def prepare_query(self, *, target_signal):
        self.n_outputs = target_signal.shape[1]

    def query(self):
        self.res = np.random.randn(self.n_sources, self.n_outputs)
