"""g1_locomotion_tpu — TPU-native SRBD-MPC + WBID locomotion framework.

A from-scratch JAX/Pallas reimplementation of the capability set of
ioloizou/g1_locomotion (see SURVEY.md): batched convex MPC over contact
forces, whole-body inverse dynamics QP, gait/footstep/swing generation, and
SRBD rollouts — jit-compiled, vmapped over scenarios, sharded over device
meshes.
"""

import jax as _jax

# Control-grade numerics: this framework solves ill-conditioned QPs (cond(H)
# up to ~1e10) in float32 on TPU. Reduced-precision MXU passes corrupt the
# QP data enough to change contact forces by >10% — force full f32 matmul
# accumulation everywhere. The matrices are tiny (<= a few hundred square), so
# the MXU throughput cost is negligible for this workload.
_jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"
