"""Pallas windowed warp kernel: CPU-interpret-mode correctness tests.

The kernel itself targets TPU; under the CPU test mesh we validate the
wrapper logic (overflow detection + fallback) and the kernel math in
Pallas interpreter mode on a small shape.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from float_tpu.ops.warp import grid_sample_bilinear_xla, identity_grid
from float_tpu.ops.pallas.warp_kernel import _overflow_mask, supports


def test_supports_predicate():
    assert supports((2, 128, 128, 128), (2, 128, 128, 2), jnp.bfloat16)
    assert not supports((2, 128, 64, 64), (2, 64, 64, 2), jnp.bfloat16)
    assert not supports((2, 128, 128, 128), (2, 128, 128, 2), jnp.float32)
    # grid resolution must match feat resolution
    assert not supports((2, 128, 256, 256), (2, 128, 128, 2), jnp.bfloat16)


def test_overflow_mask_small_flow():
    h = w = 256
    grid = identity_grid(h)[None] + 0.01      # ~1.3 px displacement
    ov = _overflow_mask(h, w, grid[..., 1], grid[..., 0], my=8, mx=64)
    assert not bool(jnp.any(ov))


def test_overflow_mask_large_flow():
    h = w = 256
    grid = identity_grid(h)[None] + 0.5       # 64 px displacement: > my
    ov = _overflow_mask(h, w, grid[..., 1], grid[..., 0], my=8, mx=64)
    assert bool(jnp.any(ov))


def test_overflow_mask_out_of_image_is_not_overflow():
    """Taps outside the image are zero-padded (weight 0), not overflow."""
    h = w = 256
    grid = identity_grid(h)[None] + 3.0       # far outside the image
    ov = _overflow_mask(h, w, grid[..., 1], grid[..., 0], my=8, mx=64)
    assert not bool(jnp.any(ov))


def test_shift_kernel_supports_and_overflow():
    from float_tpu.ops.pallas import shift_warp_kernel as sk
    assert sk.supports((2, 32, 128, 128), (2, 128, 128, 2), jnp.bfloat16)
    assert not sk.supports((2, 32, 64, 64), (2, 64, 64, 2), jnp.bfloat16)
    assert not sk.supports((2, 32, 128, 128), (2, 128, 128, 2), jnp.float32)

    h = w = 128
    grid = identity_grid(h)[None] + 0.002        # sub-pixel flow
    ov = sk._overflow_mask(h, w, grid[..., 1], grid[..., 0], 3)
    assert not bool(jnp.any(ov))
    grid_big = identity_grid(h)[None] + 0.2      # ~13 px: beyond D=3
    ov2 = sk._overflow_mask(h, w, grid_big[..., 1], grid_big[..., 0], 3)
    assert bool(jnp.any(ov2))
