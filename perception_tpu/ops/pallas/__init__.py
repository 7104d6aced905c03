"""Pallas TPU kernels for the hot paths.

Each kernel has a jnp oracle in its host module and is tested against
it (Caffe's CPU-vs-GPU cross-check pattern, SURVEY.md §4). On non-TPU
backends kernels run in interpreter mode so the full test suite works
on the virtual CPU mesh.
"""

import jax


def interpret_mode() -> bool:
    """True when Pallas must run interpreted (no TPU backend)."""
    return jax.default_backend() != "tpu"
