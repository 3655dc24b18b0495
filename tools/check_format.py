#!/usr/bin/env python3
"""In-tree format gate (reference black.yml:1-11 parity).

The reference enforces black in CI; this environment cannot install
external formatters, so this dependency-free checker enforces the
mechanical invariants the codebase follows by hand and CI runs it on
every push (lint.yml) alongside a standard `black --check` job:

- no tab characters in Python source
- no trailing whitespace
- every file ends with exactly one newline
- no CRLF line endings
- lines <= 88 columns (black's default; the codebase targets 79 but
  long string literals / URLs get black's tolerance)

Exit 0 when clean; exit 1 listing every violation.
"""

from __future__ import annotations

import os
import sys

MAX_LEN = 88
SKIP_DIRS = {".git", "data", "results", "artifacts", "website",
             "__pycache__", ".pytest_cache", "node_modules", ".jax_cache"}


def check_file(path):
    problems = []
    with open(path, "rb") as f:
        raw = f.read()
    if b"\r" in raw:
        problems.append((0, "CRLF line ending"))
    if raw and not raw.endswith(b"\n"):
        problems.append((0, "missing newline at end of file"))
    if raw.endswith(b"\n\n\n"):
        problems.append((0, "multiple blank lines at end of file"))
    text = raw.decode("utf-8", errors="replace")
    for lineno, line in enumerate(text.splitlines(), 1):
        if "\t" in line:
            problems.append((lineno, "tab character"))
        if line != line.rstrip():
            problems.append((lineno, "trailing whitespace"))
        if len(line) > MAX_LEN:
            problems.append((lineno, f"line length {len(line)} > {MAX_LEN}"))
    return problems


def main(root="."):
    bad = 0
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = sorted(d for d in dirnames if d not in SKIP_DIRS)
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            for lineno, what in check_file(path):
                print(f"{path}:{lineno}: {what}")
                bad += 1
    if bad:
        print(f"\n{bad} formatting problem(s).", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
