"""Solver logging.

The reference routes all printing through a CRTP OutputStream
(tools/output_stream.h:15-38) so embedders can redirect solver logs. Here,
iteration-level printing inside jit uses jax.debug.print (gated statically on
Options.display_level, see core/algorithm.py), and the final summary —
printed host-side by the facades — goes through a replaceable stream object.
"""

from __future__ import annotations

import sys

import numpy as np

from fbstab_tpu.options import Display, Options
from fbstab_tpu.solver_out import ExitFlag, SolverOut

_EFLAG_NAMES = {
    ExitFlag.SUCCESS: "Success",
    ExitFlag.DIVERGENCE: "Divergence",
    ExitFlag.MAXITERATIONS: "Iteration limit exceeded",
    ExitFlag.PRIMAL_INFEASIBLE: "Primal Infeasibility",
    ExitFlag.DUAL_INFEASIBLE: "Dual Infeasibility",
    ExitFlag.PRIMAL_DUAL_INFEASIBLE: "Primal-Dual Infeasibility",
    ExitFlag.LINEAR_SOLVER_FAILED: "Linear solver failure",
}


class OutputStream:
    """Replaceable print sink (reference: tools/output_stream.h)."""

    def print(self, msg: str) -> None:
        sys.stdout.write(msg)


class NullStream(OutputStream):
    def print(self, msg: str) -> None:
        pass


def print_final(out: SolverOut, options: Options,
                stream: OutputStream | None = None) -> None:
    """Final summary (reference: FBstabAlgorithm::PrintFinal,
    fbstab_algorithm-impl.h:491-541). No-ops for batched output."""
    if options.display_level < Display.FINAL:
        return
    stream = stream or OutputStream()
    eflag = np.asarray(out.eflag)
    if eflag.ndim > 0:  # batched solve: keep host logs quiet
        return
    name = _EFLAG_NAMES.get(ExitFlag(int(eflag)), "Unknown")
    stream.print("\nOptimization completed!  Exit code: %s\n" % name)
    stream.print(
        "Time elapsed: %f ms (-1.0 indicates timing disabled)\n"
        % (1000.0 * float(np.asarray(out.solve_time))))
    stream.print("Proximal iterations: %d out of %d\n"
                 % (int(np.asarray(out.prox_iters)), options.max_prox_iters))
    stream.print("Newton iterations: %d out of %d\n"
                 % (int(np.asarray(out.newton_iters)),
                    options.max_newton_iters))
    stream.print("Residual: %10.4e\n\n" % float(np.asarray(out.residual)))
