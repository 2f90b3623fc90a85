"""Global framework configuration.

Unlike the reference (which inherits dtype/device decisions from torch
defaults), TPU performance is dominated by (a) whether matmuls run in
bfloat16 on the MXU and (b) whether Pallas kernels are used for the hot
interaction ops.  Both are process-wide switches read at *model build* time.
"""

import jax.numpy as jnp

_COMPUTE_DTYPE = jnp.float32
_USE_PALLAS = "auto"  # "auto" | True | False


def set_compute_dtype(dtype):
    """Set the activation/matmul compute dtype (params stay float32).

    Use ``set_compute_dtype('bfloat16')`` before building a model to run
    every Dense/interaction matmul on the MXU in bf16.
    """
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = jnp.dtype(dtype) if not isinstance(dtype, str) else jnp.dtype(dtype)


def compute_dtype():
    return _COMPUTE_DTYPE


def set_use_pallas(mode):
    """Control Pallas kernel dispatch: True / False / 'auto' (TPU only)."""
    global _USE_PALLAS
    assert mode in (True, False, "auto")
    _USE_PALLAS = mode


def use_pallas():
    """Resolve the Pallas switch against the current default backend."""
    if _USE_PALLAS == "auto":
        import jax
        try:
            return jax.default_backend() not in ("cpu", "gpu")
        except Exception:
            return False
    return _USE_PALLAS


def use_pallas_explicit():
    """True only when the user explicitly enabled Pallas (not 'auto') —
    used by ops whose kernels win isolated but lose inside the fused
    train step (see ops/dispatch.py)."""
    return _USE_PALLAS is True
