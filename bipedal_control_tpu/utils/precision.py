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
full ``float32`` unless overridden.  Precedence: the
``BIPEDAL_MATMUL_PRECISION`` env var (explicit experiment override) beats a
per-robot ``matmulPrecision`` key in task.info/overrides.info (deployment
config, config/loader.py) beats the "float32" default.  Valid values:
"float32", "bfloat16_3x" (3-pass compromise), "bfloat16" (raw XLA default).

There is no analogue in the reference (CPU/ROS C++ on Eigen doubles never
faces a reduced-precision matrix unit); this is a TPU-specific deployment
rule.
"""
from __future__ import annotations

import os

import jax


def matmul_precision(configured: str | None = None) -> str:
    """The effective precision name (env > per-robot config > default)."""
    return os.environ.get("BIPEDAL_MATMUL_PRECISION") or configured or "float32"


def default_matmul_precision(configured: str | None = None):
    """Context manager: trace enclosed ops at the effective precision.

    ``configured`` is the per-robot task value (TaskConfig.matmul_precision)
    where the caller has an interface in scope; entry points without one use
    the plain default."""
    return jax.default_matmul_precision(matmul_precision(configured))
