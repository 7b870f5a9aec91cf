"""Runtime field-backend registry.

The reference selects its arithmetic backend with compile-time Go build
tags (README.md:43-47; SURVEY.md section 5 "config/flag system"); here the
choice is a runtime switch between implementations of the hot op
(Montgomery multiplication):

  "vector" — the XLA column-sum engine (limbs.mont_mul), works on every
             platform
  "pallas" — the fused kernel (pallas_kernels.mont_mul_pallas): the whole
             product + REDC pipeline VMEM-resident; measured 21x the
             vector path on TPU (BENCH_TPU.md), bit-identical
  "auto"   — pallas on TPU, vector elsewhere; the default

Select with KZG_TPU_FIELD_BACKEND or set_field_backend(). Both backends
are exact and bit-identical — the differential tests in
tests/test_field_backends.py pin that down (the analogue of the
reference's per-build-tag CI matrix).
"""

from __future__ import annotations

import os

_BACKEND = os.environ.get("KZG_TPU_FIELD_BACKEND", "auto")


def set_field_backend(name: str) -> None:
    global _BACKEND
    if name not in ("vector", "pallas", "auto"):
        raise ValueError(f"unknown field backend {name!r}")
    _BACKEND = name


def field_backend() -> str:
    """Resolve the active backend name ("vector" or "pallas")."""
    if _BACKEND != "auto":
        return _BACKEND
    import jax

    return "pallas" if jax.default_backend() == "tpu" else "vector"
