"""Build/verify the framework's native and device components.

The reference's install.py builds one Docker image per algorithm library
(install.py:9-92).  This framework runs algorithms in subprocesses instead
of containers (see kmb_tpu/runner.py), so installation means:

1. compile the native C++ oracle library (native/kmb_native.cpp),
2. verify the JAX backend and report the visible devices,
3. verify every algorithm module in algos.yaml imports cleanly.
"""

from __future__ import annotations

import argparse
import subprocess
import sys


def build_native():
    print("Building native library (native/kmb_native.cpp)...")
    proc = subprocess.run(["make", "-C", "native"],
                          capture_output=True, text=True)
    sys.stdout.write(proc.stdout)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr)
        return False
    from kmb_tpu import native
    ok = native.is_available()
    print(f"native library: {'OK' if ok else 'MISSING'} "
          f"(threads={native.num_threads()})")
    return ok


def check_jax():
    import jax
    devices = jax.devices()
    print(f"jax backend: {jax.default_backend()}, devices: {devices}")
    return True


def check_algorithms(definition_file):
    from kmb_tpu.definitions import (
        InstantiationStatus, algorithm_status, list_algorithms)
    import yaml

    with open(definition_file) as f:
        entries = yaml.safe_load(f)
    ok = True
    for name, entry in sorted(entries.items()):
        from kmb_tpu.definitions import Definition
        definition = Definition(
            algorithm=name, module=entry["module"],
            constructor=entry["constructor"], arguments={},
            query_argument_groups=[])
        status = algorithm_status(definition)
        print(f"  {name:32s} {status.name}")
        if status == InstantiationStatus.NO_MODULE:
            ok = False
    return ok


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--definitions", default="algos.yaml")
    parser.add_argument("--skip-jax", action="store_true",
                        help="skip backend probing (slow on cold tunnels)")
    args = parser.parse_args(argv)

    ok = build_native()
    print("Checking algorithm modules:")
    ok &= check_algorithms(args.definitions)
    if not args.skip_jax:
        ok &= check_jax()
    print("install:", "OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
