"""Model inspection — parameter counting / architecture tables.

Replaces the reference's BaseModel.print_architecture (basemodel.py:29-89,
output captured in doc/NETWORKS.md) for param pytrees.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np


def num2str(num: float, precision: int = 2) -> str:
    if not num:
        return "N/A"
    if abs(num) >= 1e6:
        return f"{num / 1e6:.{precision}f} M"
    if abs(num) >= 1e3:
        return f"{num / 1e3:.{precision}f} K"
    return str(int(num))


def count_params(tree: Any) -> int:
    return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(tree))


def architecture_table(params: Dict[str, Any], max_depth: int = 1,
                       _prefix: str = "") -> str:
    """Per-subtree parameter counts, indented by depth."""
    lines = []

    def walk(tree, name, depth):
        total = count_params(tree)
        lines.append(f"{'  ' * depth}{name}: {num2str(total)} params")
        if isinstance(tree, dict) and (max_depth < 0 or depth < max_depth):
            for k in sorted(tree, key=lambda s: (len(s), s)):
                if isinstance(tree[k], dict):
                    walk(tree[k], k, depth + 1)

    for key in params:
        walk(params[key], key, 0)
    lines.append(f"TOTAL: {num2str(sum(count_params(v) for v in params.values()))} params")
    return "\n".join(lines)
