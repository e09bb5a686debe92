"""Differentiable QP solving (fbstab_tpu/diff.py): implicit-function
gradients checked against central finite differences on strictly
complementary problems, across all three QP classes, plus composition
with jit/vmap and degeneracy NaN-safety.
"""

import jax
import jax.numpy as jnp
import numpy as np

from fbstab_tpu import ExitFlag, Options, dense_qp_data, sparse_qp_data
from fbstab_tpu.diff import (
    solve_dense_qp_diff,
    solve_mpc_qp_diff,
    solve_sparse_qp_diff,
)

OPTS = Options(abs_tol=1e-11)
EPS = 1e-6


def _dense_problem(seed=0, nz=5, nl=2, nv=4):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((nz, nz))
    H = M @ M.T + 0.5 * np.eye(nz)
    f = rng.standard_normal(nz)
    G = rng.standard_normal((nl, nz))
    h = rng.standard_normal(nl) * 0.2
    A = rng.standard_normal((nv, nz))
    b = rng.standard_normal(nv) * 0.5 + 1.0
    return H, f, G, h, A, b


def _fd_check(loss, data, fields, rng, probes=3, rtol=5e-4, atol=1e-4):
    """Central-difference check of jax.grad(loss)(data) on random
    entries of the given pytree fields."""
    g = jax.grad(loss)(data)
    for field in fields:
        arr = np.array(getattr(data, field))
        ga = np.asarray(getattr(g, field))
        assert np.all(np.isfinite(ga)), f"non-finite grad in {field}"
        for _ in range(probes):
            idx = tuple(rng.integers(0, s) for s in arr.shape)

            def bump(s):
                a2 = arr.copy()
                a2[idx] += s
                return data._replace(**{field: jnp.asarray(a2)})

            fdv = (float(loss(bump(EPS))) - float(loss(bump(-EPS)))) \
                / (2 * EPS)
            av = float(ga[idx])
            # FD noise floor: the solve is accurate to ~abs_tol, so the
            # difference quotient carries ~abs_tol/EPS absolute noise.
            adiff = abs(av - fdv)
            err = adiff / max(1e-6, abs(av), abs(fdv))
            assert err < rtol or adiff < atol, (
                f"grad mismatch {field}{idx}: ad={av} fd={fdv} rel={err}")


def test_dense_gradients_match_finite_differences():
    H, f, G, h, A, b = _dense_problem()
    data = dense_qp_data(H, f, G, h, A, b)
    nz, nl, nv = 5, 2, 4
    z0, l0, v0 = jnp.zeros(nz), jnp.zeros(nl), jnp.zeros(nv)

    @jax.jit
    def loss(d):
        z, l, v = solve_dense_qp_diff(d, z0, l0, v0, OPTS)
        return (0.5 * jnp.sum(z**2) + jnp.sum(l)
                + jnp.sum(v * jnp.arange(1.0, nv + 1)))

    _fd_check(loss, data, ("H", "f", "G", "h", "A", "b"),
              np.random.default_rng(1))


def test_inactive_constraints_have_zero_gradient():
    """Rows of (A, b) that are strictly inactive at the solution cannot
    influence it: their gradients must be exactly zero."""
    H, f, G, h, A, b = _dense_problem()
    data = dense_qp_data(H, f, G, h, A, b)
    z0, l0, v0 = jnp.zeros(5), jnp.zeros(2), jnp.zeros(4)

    from fbstab_tpu import solve_dense_qp
    x, core = solve_dense_qp(data, z0, l0, v0, OPTS)
    inactive = np.asarray(x.y) > 1e-6

    def loss(d):
        z, l, v = solve_dense_qp_diff(d, z0, l0, v0, OPTS)
        return 0.5 * jnp.sum(z**2)

    g = jax.grad(loss)(data)
    assert np.all(np.abs(np.asarray(g.b)[inactive]) < 1e-9)
    assert np.all(np.abs(np.asarray(g.A)[inactive, :]) < 1e-9)


def test_mpc_gradients_match_finite_differences():
    """Differentiable MPC: gradients w.r.t. stage costs, dynamics,
    constraints, and the initial state on a random strictly convex OCP
    (interior fixture — the benchmark plants sit exactly on feasibility
    boundaries where FD is undefined)."""
    import sys
    sys.path.insert(0, "tests")
    from tests.test_mpc_solve import random_mpc

    N, nx, nu, nc = 4, 3, 2, 4
    data = random_mpc(jax.random.key(7), N=N, nx=nx, nu=nu, nc=nc)
    nz, nl, nv = (N + 1) * (nx + nu), (N + 1) * nx, (N + 1) * nc
    z0, l0, v0 = jnp.zeros(nz), jnp.zeros(nl), jnp.zeros(nv)

    @jax.jit
    def loss(d):
        z, l, v = solve_mpc_qp_diff(d, z0, l0, v0, OPTS)
        return 0.5 * jnp.sum(z**2) + 0.1 * jnp.sum(l)

    _fd_check(loss, data,
              ("Q", "R", "S", "q", "r", "x0", "A", "B", "c", "E", "L", "d"),
              np.random.default_rng(2), probes=2)


def test_sparse_gradients_match_finite_differences():
    H, f, G, h, A, b = _dense_problem(seed=3)
    # Sparsify off-diagonals, keep symmetry + the diagonal.
    H = np.where((np.abs(H) < 0.3) & ~np.eye(5, dtype=bool), 0.0, H)
    A = np.where(np.abs(A) < 0.2, 0.0, A)
    pat, data = sparse_qp_data(H, f, G, h, A, b)
    z0, l0, v0 = jnp.zeros(5), jnp.zeros(2), jnp.zeros(4)

    @jax.jit
    def loss(d):
        z, l, v = solve_sparse_qp_diff(pat, d, z0, l0, v0, OPTS)
        return 0.5 * jnp.sum(z**2) + jnp.sum(l)

    _fd_check(loss, data, ("Hx", "f", "Gx", "h", "Ax", "b"),
              np.random.default_rng(4))


def test_grad_through_vmap():
    """vmap(grad(loss)) over a batch of dense QPs: per-instance
    gradients equal the single-instance ones."""
    H, f, G, h, A, b = _dense_problem()
    data = dense_qp_data(H, f, G, h, A, b)
    z0, l0, v0 = jnp.zeros(5), jnp.zeros(2), jnp.zeros(4)

    def loss(d):
        z, l, v = solve_dense_qp_diff(d, z0, l0, v0, OPTS)
        return 0.5 * jnp.sum(z**2)

    B = 3
    dB = jax.tree.map(lambda a: jnp.stack([a] * B), data)
    dB = dB._replace(f=dB.f * jnp.asarray([1.0, 1.1, 0.9])[:, None])
    gB = jax.jit(jax.vmap(jax.grad(loss)))(dB)
    g1 = jax.grad(loss)(jax.tree.map(lambda a: a[0], dB))
    np.testing.assert_allclose(np.asarray(gB.f[0]), np.asarray(g1.f),
                               atol=1e-10)
    # Different f scaling => different gradients per lane.
    assert not np.allclose(np.asarray(gB.f[0]), np.asarray(gB.f[1]))


def test_grad_through_closed_loop():
    """Learning-MPC composition: gradient of a rollout cost through
    THREE chained solves (u_t from solve t feeds the plant, the next
    state warm-starts nothing but parameterizes solve t+1 via x0) — the
    custom_vjp chains through lax.scan. FD-checked w.r.t. a cost weight
    and the initial state."""
    import sys
    sys.path.insert(0, "tests")
    from tests.test_mpc_solve import random_mpc

    N, nx, nu, nc = 3, 3, 2, 4
    base = random_mpc(jax.random.key(11), N=N, nx=nx, nu=nu, nc=nc)
    nz, nl, nv = (N + 1) * (nx + nu), (N + 1) * nx, (N + 1) * nc
    z0, l0, v0 = jnp.zeros(nz), jnp.zeros(nl), jnp.zeros(nv)
    steps = 3

    @jax.jit
    def rollout_cost(d):
        def step(x0, _):
            dt = d._replace(x0=x0)
            z, l, v = solve_mpc_qp_diff(dt, z0, l0, v0, OPTS)
            u0 = z[nx:nx + nu]
            x_next = d.A[0] @ x0 + d.B[0] @ u0 + d.c[0]
            return x_next, 0.5 * jnp.sum(x_next**2) + 0.1 * jnp.sum(u0**2)

        _, costs = jax.lax.scan(step, d.x0, None, length=steps)
        return jnp.sum(costs)

    # Looser tolerances: FD truncation error and solve-tolerance noise
    # both compound through three chained solves (gradient magnitudes
    # span 1e-4..1e3 here).
    _fd_check(rollout_cost, base, ("x0", "q"),
              np.random.default_rng(5), probes=2, rtol=5e-3, atol=1e-2)


def test_batch_diff_matches_per_instance_diff():
    """The batch-level differentiable solver (forward through the
    solve_mpc_qp_batch dispatch) produces the same gradients as vmapping
    the per-instance one."""
    import sys
    sys.path.insert(0, "tests")
    from fbstab_tpu.diff import solve_mpc_qp_batch_diff
    from tests.test_mpc_solve import random_mpc

    N, nx, nu, nc = 4, 3, 2, 4
    d0 = random_mpc(jax.random.key(9), N=N, nx=nx, nu=nu, nc=nc)
    nz, nl, nv = (N + 1) * (nx + nu), (N + 1) * nx, (N + 1) * nc
    B = 3
    dB = jax.tree.map(lambda a: jnp.stack([a] * B), d0)
    dB = dB._replace(q=dB.q * jnp.asarray([1.0, 1.05, 0.95])[:, None, None])
    zB = jnp.zeros((B, nz))
    lB = jnp.zeros((B, nl))
    vB = jnp.zeros((B, nv))

    def loss_batch(d):
        z, l, v = solve_mpc_qp_batch_diff(d, zB, lB, vB, OPTS)
        return 0.5 * jnp.sum(z**2)

    def loss_one(d):
        z, l, v = solve_mpc_qp_diff(
            d, zB[0], lB[0], vB[0], OPTS)
        return 0.5 * jnp.sum(z**2)

    gB = jax.jit(jax.grad(loss_batch))(dB)
    g_each = jax.vmap(jax.grad(loss_one))(dB)
    # atol covers vectorization-order rounding between the batched and
    # vmapped-per-instance backward passes.
    for got, want in zip(jax.tree.leaves(gB), jax.tree.leaves(g_each)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-7)


def test_out_of_range_alpha_gradients_consistent():
    """Out-of-range options are saturated by the solve; the backward
    pass must use the SAME saturated alpha (an unsaturated alpha would
    build an inconsistent Newton matrix and O(1)-wrong gradients)."""
    H, f, G, h, A, b = _dense_problem()
    data = dense_qp_data(H, f, G, h, A, b)
    z0, l0, v0 = jnp.zeros(5), jnp.zeros(2), jnp.zeros(4)

    def loss(d, opts):
        z, l, v = solve_dense_qp_diff(d, z0, l0, v0, opts)
        return 0.5 * jnp.sum(z**2) + jnp.sum(v)

    g_bad = jax.grad(loss)(data, Options(abs_tol=1e-11, alpha=1.5))
    sat = Options(abs_tol=1e-11, alpha=1.5).validated().alpha
    g_ref = jax.grad(loss)(data, Options(abs_tol=1e-11, alpha=sat))
    np.testing.assert_allclose(np.asarray(g_bad.b), np.asarray(g_ref.b),
                               atol=1e-9)


def test_jacfwd_matches_jacrev():
    """Forward-mode (custom_jvp) and reverse-mode (custom_vjp) implicit
    differentiation agree on the full Jacobian d z*/d f."""
    from fbstab_tpu.diff import make_jvp_solver
    from fbstab_tpu.models.dense_qp import DENSE_OPS

    H, f, G, h, A, b = _dense_problem()
    data = dense_qp_data(H, f, G, h, A, b)
    z0, l0, v0 = jnp.zeros(5), jnp.zeros(2), jnp.zeros(4)
    fwd_solve = make_jvp_solver(DENSE_OPS, OPTS, 1e-9)

    def z_of_f_fwd(fv):
        return fwd_solve(data._replace(f=fv), z0, l0, v0)[0]

    def z_of_f_rev(fv):
        return solve_dense_qp_diff(data._replace(f=fv), z0, l0, v0,
                                   OPTS, 1e-9)[0]

    Jf = jax.jacfwd(z_of_f_fwd)(data.f)
    Jr = jax.jacrev(z_of_f_rev)(data.f)
    np.testing.assert_allclose(np.asarray(Jf), np.asarray(Jr), atol=1e-8)


def test_mpc_feedback_gain_matches_fd():
    """K = d u0*/d x0 from forward-mode sensitivity matches finite
    differences on an interior problem (the implicit MPC feedback law)."""
    import sys
    sys.path.insert(0, "tests")
    from fbstab_tpu.diff import mpc_feedback_gain
    from fbstab_tpu.models.mpc_qp import solve_mpc_qp
    from tests.test_mpc_solve import random_mpc

    N, nx, nu, nc = 4, 3, 2, 4
    data = random_mpc(jax.random.key(13), N=N, nx=nx, nu=nu, nc=nc)
    K = np.asarray(mpc_feedback_gain(data, OPTS))
    assert K.shape == (nu, nx)

    nz = (N + 1) * (nx + nu)
    nl, nv = (N + 1) * nx, (N + 1) * nc
    z0, l0, v0 = jnp.zeros(nz), jnp.zeros(nl), jnp.zeros(nv)

    def u0(x0):
        x, core = solve_mpc_qp(data._replace(x0=jnp.asarray(x0)),
                               z0, l0, v0, OPTS)
        assert int(core.eflag) == ExitFlag.SUCCESS
        return np.asarray(x.z)[nx:nx + nu]

    x0 = np.asarray(data.x0)
    for j in range(nx):
        e = np.zeros(nx)
        e[j] = EPS
        fd = (u0(x0 + e) - u0(x0 - e)) / (2 * EPS)
        np.testing.assert_allclose(K[:, j], fd, rtol=1e-4, atol=1e-6)


def test_f32_gradients_close_to_f64():
    """The f32 profile (sigma_vjp=1e-5 default) produces gradients close
    to the f64 ones — the configuration the TPU path runs."""
    H, f, G, h, A, b = _dense_problem()
    z064, l064, v064 = jnp.zeros(5), jnp.zeros(2), jnp.zeros(4)

    def loss64(d):
        z, l, v = solve_dense_qp_diff(d, z064, l064, v064, OPTS)
        return 0.5 * jnp.sum(z**2)

    g64 = jax.grad(loss64)(dense_qp_data(H, f, G, h, A, b))

    opts32 = Options(abs_tol=1e-6, sigma0=1e-6)
    d32 = dense_qp_data(H, f, G, h, A, b, dtype=jnp.float32)
    z032 = jnp.zeros(5, jnp.float32)
    l032 = jnp.zeros(2, jnp.float32)
    v032 = jnp.zeros(4, jnp.float32)

    def loss32(d):
        z, l, v = solve_dense_qp_diff(d, z032, l032, v032, opts32)
        return 0.5 * jnp.sum(z**2)

    g32 = jax.grad(loss32)(d32)
    for a64, a32 in zip(jax.tree.leaves(g64), jax.tree.leaves(g32)):
        a64, a32 = np.asarray(a64), np.asarray(a32)
        assert np.all(np.isfinite(a32))
        np.testing.assert_allclose(a32, a64, rtol=5e-3, atol=5e-4)


def test_degenerate_fixture_gradients_finite():
    """At dual-degenerate / boundary fixtures (the double integrator sits
    exactly on its feasibility boundary) the gradient is a subgradient —
    it must be FINITE (the guarded PFB C-differential), never NaN."""
    from fbstab_tpu.models.mpc_qp import mpc_dims
    from fbstab_tpu.models.ocp_fixtures import double_integrator

    data, _ = double_integrator(8, dtype=jnp.float64)
    N, nx, nu, nc = mpc_dims(data)
    nz, nl, nv = (N + 1) * (nx + nu), (N + 1) * nx, (N + 1) * nc
    z0, l0, v0 = jnp.zeros(nz), jnp.zeros(nl), jnp.zeros(nv)

    def loss(d):
        z, l, v = solve_mpc_qp_diff(d, z0, l0, v0, OPTS)
        return 0.5 * jnp.sum(z**2)

    g = jax.grad(loss)(data)
    for leaf in jax.tree.leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))
