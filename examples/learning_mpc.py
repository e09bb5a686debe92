"""Learning MPC cost weights by gradient descent THROUGH the solver.

The differentiable layer (fbstab_tpu.diff) lets an outer loop tune MPC
parameters against an objective on the resulting trajectory: here we
learn diagonal state weights Q so the closed-form MPC plan lands a
double integrator on a desired terminal state. Each gradient is exact
implicit differentiation through the converged QP (no unrolling of
solver iterations).

Run:  python examples/learning_mpc.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import fbstab_tpu  # noqa: F401
from fbstab_tpu import Options, solve_mpc_qp_diff
from fbstab_tpu.models.mpc_qp import MpcQPData


def make_plant(N=12, dt=0.1):
    """Double integrator with loose input bounds (|u| <= 5, inactive at
    the optimum) so the solution depends smoothly on the weights."""
    nx, nu, nc = 2, 1, 2
    A = jnp.asarray([[1.0, dt], [0.0, 1.0]])
    B = jnp.asarray([[0.5 * dt * dt], [dt]])
    L = jnp.asarray([[1.0], [-1.0]])
    return MpcQPData(
        Q=jnp.broadcast_to(jnp.eye(nx), (N + 1, nx, nx)),
        R=jnp.broadcast_to(0.1 * jnp.eye(nu), (N + 1, nu, nu)),
        S=jnp.zeros((N + 1, nu, nx)),
        q=jnp.zeros((N + 1, nx)),
        r=jnp.zeros((N + 1, nu)),
        A=jnp.broadcast_to(A, (N, nx, nx)),
        B=jnp.broadcast_to(B, (N, nx, nu)),
        c=jnp.zeros((N, nx)),
        E=jnp.zeros((N + 1, nc, nx)),
        L=jnp.broadcast_to(L, (N + 1, nc, nu)),
        d=jnp.full((N + 1, nc), -5.0),     # E x + L u + d <= 0 => |u| <= 5
        x0=jnp.asarray([1.0, 0.0]))


def main():
    # f64 + implicit differentiation: host/CPU work by design.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    N, nx, nu = 12, 2, 1
    data = make_plant(N)
    nc = data.E.shape[1]
    nz, nl, nv = (N + 1) * (nx + nu), (N + 1) * nx, (N + 1) * nc
    z0, l0, v0 = jnp.zeros(nz), jnp.zeros(nl), jnp.zeros(nv)
    opts = Options(abs_tol=1e-10)
    target = jnp.asarray([0.1, -0.3])     # desired terminal (pos, vel)

    def terminal_state(log_qdiag):
        qdiag = jnp.exp(log_qdiag)                     # keep Q PSD
        Q = jnp.broadcast_to(jnp.diag(qdiag), data.Q.shape)
        z, l, v = solve_mpc_qp_diff(data._replace(Q=Q), z0, l0, v0, opts)
        return z.reshape(N + 1, nx + nu)[-1, :nx]

    def loss(log_qdiag):
        return 0.5 * jnp.sum((terminal_state(log_qdiag) - target) ** 2)

    theta = jnp.zeros(nx)                              # Q = I
    step = jax.jit(jax.value_and_grad(loss))
    lr = 0.8
    print(f"initial loss {float(loss(theta)):.6f}  "
          f"terminal {np.asarray(terminal_state(theta)).round(4)}")
    for it in range(40):
        val, g = step(theta)
        theta = theta - lr * g
        if it % 8 == 0:
            print(f"iter {it:3d}  loss {float(val):.6f}  "
                  f"Q diag {np.exp(np.asarray(theta)).round(3)}")
    print(f"final loss {float(loss(theta)):.6f}  "
          f"terminal {np.asarray(terminal_state(theta)).round(4)}  "
          f"(target {np.asarray(target)})")


if __name__ == "__main__":
    main()
