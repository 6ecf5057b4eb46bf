#!/usr/bin/env python
"""Pre-commit version-consistency check: pyproject.toml vs
float_tpu.__version__ (equivalent of the reference's tools/check_versions.py
hook)."""
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    with open(os.path.join(ROOT, "pyproject.toml")) as f:
        m = re.search(r'^version\s*=\s*"([^"]+)"', f.read(), re.M)
    pyproject_version = m.group(1) if m else None

    with open(os.path.join(ROOT, "float_tpu", "__init__.py")) as f:
        m = re.search(r'^__version__\s*=\s*"([^"]+)"', f.read(), re.M)
    module_version = m.group(1) if m else None

    if pyproject_version != module_version:
        print(f"version mismatch: pyproject={pyproject_version} "
              f"float_tpu.__version__={module_version}")
        sys.exit(1)
    print(f"versions consistent: {pyproject_version}")


if __name__ == "__main__":
    main()
