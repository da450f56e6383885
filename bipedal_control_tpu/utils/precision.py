"""TPU matmul-precision policy for the framework's jitted entry points.

On TPU, XLA lowers an f32 ``dot_general`` to a SINGLE bf16 pass on the MXU
by default (~8 mantissa bits).  For this framework's small, ill-conditioned
tensor algebra — physics mass-matrix solves, stage-KKT factorizations,
contact Jacobian products — that default is a correctness hazard, not a
performance win:

- the on-device domain-randomized walking survival at standard jitter is
  26.6% under the bf16 default vs 51.6% under full-f32 matmuls (same seed,
  same chip), while TRUE f32 on CPU matches f64 exactly (62.5% both) —
  i.e. the whole "f32 robustness gap" recorded in SCENARIOS_r04.json was
  the matmul precision, not the storage dtype;
- the solve is VPU-bound by construction (~0.2% MXU utilization, see
  bench.py MFU fields), so the 6-pass full-f32 MXU mode costs ~nothing
  in throughput.

All production jit entry points (sim/batch_loop, runtime/mpc_runner,
bench.py) therefore trace under :func:`default_matmul_precision`, which is
full ``float32`` unless overridden via ``BIPEDAL_MATMUL_PRECISION``
(e.g. "bfloat16" to recover the raw XLA default, "bfloat16_3x" for the
3-pass compromise).

There is no analogue in the CUDA reference (TF32 tensor cores are opt-IN
under torch/CUDA); this is a TPU-specific deployment rule.
"""
from __future__ import annotations

import os

import jax


def matmul_precision() -> str:
    """The configured precision name (env ``BIPEDAL_MATMUL_PRECISION``)."""
    return os.environ.get("BIPEDAL_MATMUL_PRECISION", "float32")


def default_matmul_precision():
    """Context manager: trace enclosed ops at the configured precision."""
    return jax.default_matmul_precision(matmul_precision())
