"""Fused compute ops — the performance-critical math of the framework.

Everything here is pure JAX shaped for the TPU MXU/VPU (and, where XLA's
fusion isn't enough, Pallas kernels).  The reference implements these
surfaces as per-sample torch loops or bmm chains (SURVEY §3.5, §7.3).
"""

from .bdc import bdc_pool, triuvec

__all__ = ["bdc_pool", "triuvec"]
