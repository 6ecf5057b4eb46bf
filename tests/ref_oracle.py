"""Load reference modules from /root/reference as numerical oracles.

The reference repo is mounted read-only; tests that use it are skipped when
it is absent.  Importing it at runtime keeps our repo free of copied code
while still giving exact-parity oracles.
"""
import importlib.util
import sys
import types
from pathlib import Path

REF = Path("/root/reference/src/nodes/models")

HAVE_REFERENCE = REF.exists()


def _load(fullname: str, path: Path, package: str | None = None):
    spec = importlib.util.spec_from_file_location(fullname, path)
    mod = importlib.util.module_from_spec(spec)
    if package:
        mod.__package__ = package
    sys.modules[fullname] = mod
    spec.loader.exec_module(mod)
    return mod


_cache = {}


def load_reference_models():
    """Returns (encoder_mod, styledecoder_mod) from the reference repo."""
    if "mods" in _cache:
        return _cache["mods"]
    # synthetic package tree so encoder.py's `from ..misc import ...` resolves
    pkg = types.ModuleType("refmodels")
    pkg.__path__ = [str(REF)]
    sys.modules["refmodels"] = pkg
    _load("refmodels.misc", REF / "misc.py", package="refmodels")
    sub = types.ModuleType("refmodels.float")
    sub.__path__ = [str(REF / "float")]
    sys.modules["refmodels.float"] = sub
    enc = _load("refmodels.float.encoder", REF / "float" / "encoder.py",
                package="refmodels.float")
    dec = _load("refmodels.float.styledecoder", REF / "float" / "styledecoder.py",
                package="refmodels.float")
    _cache["mods"] = (enc, dec)
    return enc, dec


def torch_state_to_pytree(state_dict, drop_buffers=("kernel",)):
    """torch state_dict -> nested dict pytree with jnp leaves.

    Key split on '.'; buffer leaves whose last component is in
    ``drop_buffers`` are skipped (we rebuild blur kernels from config).
    """
    import jax.numpy as jnp
    tree = {}
    for key, value in state_dict.items():
        parts = key.split(".")
        if parts[-1] in drop_buffers:
            continue
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value.detach().cpu().numpy())
    return tree
