"""fbstab_tpu: a TPU-native proximally stabilized semismooth
Fischer-Burmeister QP solver framework (JAX/XLA/Pallas/pjit).

Built from scratch with the capabilities of dliaomcp/fbstab (the reference
C++/Eigen implementation of the FBstab algorithm, Liao-McPherson &
Kolmanovsky, Automatica 113 (2020) 108801, arXiv:1901.04046), re-designed
TPU-first: pure-function components over pytrees, fixed-shape lax control
flow, massive vmap batching, and mesh sharding for multi-chip scale.
"""

import os as _os

# Raise the scoped-VMEM budget for the fused solver kernels BEFORE the
# TPU client initializes: the runtime snapshots the env at backend init
# (first jax.devices()), so setting this lazily at ops-module import is
# too late for scripts that touch devices first — the compile then runs
# against the 16 MiB default and any kernel with larger scratch (the
# Riccati Lc factor alone is 17 MiB at nx=18/N=80) fails. Importing
# fbstab_tpu at all is early enough for normal use; see
# ops/mpc_solve_pallas.py for the kernel-side rationale.
_VMEM_FLAG = "--xla_tpu_scoped_vmem_limit_kib=114688"
if _VMEM_FLAG not in _os.environ.get("LIBTPU_INIT_ARGS", ""):
    _os.environ["LIBTPU_INIT_ARGS"] = (
        _os.environ.get("LIBTPU_INIT_ARGS", "") + " " + _VMEM_FLAG).strip()

from fbstab_tpu.core.algorithm import fbstab_solve
from fbstab_tpu.core.variable import Variable
from fbstab_tpu.diff import (
    make_differentiable_batch_solver,
    make_differentiable_solver,
    make_jvp_solver,
    mpc_feedback_gain,
    solve_dense_qp_diff,
    solve_mpc_qp_batch_diff,
    solve_mpc_qp_diff,
    solve_sparse_qp_diff,
)
from fbstab_tpu.models.dense_qp import (
    DENSE_OPS,
    DenseQPData,
    FBstabDense,
    dense_qp_data,
    solve_dense_qp,
    solve_dense_qp_batch,
)
from fbstab_tpu.models.mpc_qp import (
    MPC_OPS,
    FBstabMpc,
    MpcQPData,
    mpc_qp_data,
    solve_mpc_qp,
    solve_mpc_qp_batch,
)
from fbstab_tpu.models.batch_facade import FBstabDenseBatch, FBstabMpcBatch
from fbstab_tpu.models.refine import (
    VariableDF,
    refine_dense_batch,
    refine_mpc_batch,
)
from fbstab_tpu.models.scaling import (
    DenseScaling,
    MpcScaling,
    apply_dense_scaling,
    apply_mpc_scaling,
    equilibrate_dense,
    equilibrate_mpc,
    ruiz_dense_scaling,
    ruiz_mpc_scaling,
)
from fbstab_tpu.models.sparse_qp import (
    FBstabSparse,
    SparsePattern,
    SparseQPData,
    mpc_sparse_pattern,
    mpc_sparse_values,
    pattern_values,
    solve_sparse_qp,
    solve_sparse_qp_batch,
    sparse_qp_data,
)
from fbstab_tpu.options import Display, Options
from fbstab_tpu.solver_out import ExitFlag, SolverOut

__version__ = "0.1.0"

__all__ = [
    "DENSE_OPS",
    "DenseQPData",
    "Display",
    "ExitFlag",
    "DenseScaling",
    "FBstabDense",
    "FBstabDenseBatch",
    "FBstabMpc",
    "FBstabMpcBatch",
    "FBstabSparse",
    "MPC_OPS",
    "MpcQPData",
    "MpcScaling",
    "Options",
    "SolverOut",
    "SparsePattern",
    "SparseQPData",
    "Variable",
    "VariableDF",
    "dense_qp_data",
    "apply_dense_scaling",
    "apply_mpc_scaling",
    "equilibrate_dense",
    "equilibrate_mpc",
    "ruiz_dense_scaling",
    "ruiz_mpc_scaling",
    "fbstab_solve",
    "make_differentiable_batch_solver",
    "make_differentiable_solver",
    "make_jvp_solver",
    "mpc_feedback_gain",
    "mpc_qp_data",
    "mpc_sparse_pattern",
    "mpc_sparse_values",
    "pattern_values",
    "refine_dense_batch",
    "refine_mpc_batch",
    "solve_dense_qp",
    "solve_dense_qp_batch",
    "solve_dense_qp_diff",
    "solve_mpc_qp",
    "solve_mpc_qp_batch",
    "solve_mpc_qp_batch_diff",
    "solve_mpc_qp_diff",
    "solve_sparse_qp",
    "solve_sparse_qp_batch",
    "solve_sparse_qp_diff",
    "sparse_qp_data",
]
