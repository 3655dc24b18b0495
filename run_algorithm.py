"""Subprocess entry point for isolated experiment runs.

Launched by kmb_tpu.runner.run_subprocess (the reference's Docker
ENTRYPOINT analog, run_algorithm.py:1-3).
"""

from kmb_tpu.runner import run_from_cmdline

if __name__ == "__main__":
    run_from_cmdline()
