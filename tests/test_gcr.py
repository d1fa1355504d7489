"""GCR solver tests (reference analogue: test_GCR, main.cpp:194-300, with
Eigen FullPivLU as oracle -> here numpy.linalg.solve; plus the k-critical
convergence experiments, main.cpp:696-741, 834-875)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mgpgcr_tpu import fields
from mgpgcr_tpu.mesh import LatticeMesh
from mgpgcr_tpu.ops.csr import CSRMatrix
from mgpgcr_tpu.ops.dense import DenseOperator
from mgpgcr_tpu.ops.dirac import make_dirac
from mgpgcr_tpu.solvers.gcr import GCRSolver, gcr_solve, gcr_solve_jit
from mgpgcr_tpu.solvers.params import GCRParams


def _tridiag(n=64, seed=0):
    """Well-conditioned complex tridiagonal system (the reference's test_GCR
    system shape, main.cpp:203-215)."""
    rng = np.random.default_rng(seed)
    a = np.zeros((n, n), dtype=np.complex128)
    np.fill_diagonal(a, 4.0 + 0.5j + rng.standard_normal(n) * 0.1)
    off = rng.standard_normal(n - 1) * 0.5 + 1j * rng.standard_normal(n - 1) * 0.5
    a[np.arange(n - 1), np.arange(1, n)] = off
    a[np.arange(1, n), np.arange(n - 1)] = off.conj() * 0.7 + 0.2
    return a


@pytest.mark.parametrize(
    "params",
    [
        GCRParams(tol=1e-12, max_iter=200),  # full GCR
        GCRParams(tol=1e-12, max_iter=400, restart=10),
        GCRParams(tol=1e-12, max_iter=400, truncation=10),
    ],
)
def test_gcr_dense_vs_direct(params):
    a = _tridiag()
    rng = np.random.default_rng(3)
    b = rng.standard_normal(64) + 1j * rng.standard_normal(64)
    res = gcr_solve(DenseOperator(jnp.asarray(a)), jnp.asarray(b), params)
    assert bool(res.converged)
    x_direct = np.linalg.solve(a, b)
    np.testing.assert_allclose(np.asarray(res.x), x_direct, rtol=0, atol=1e-9)
    # residual history is monotone-ish and ends below tol
    hist = res.history_list()
    assert hist[0] == pytest.approx(1.0)
    assert hist[-1] <= 1e-12
    assert len(hist) == int(res.n_iters) + 1


def test_gcr_restart_truncation_exclusive():
    with pytest.raises(ValueError):
        GCRParams(restart=5, truncation=5)


def test_gcr_zero_rhs():
    a = _tridiag(16)
    res = gcr_solve(
        DenseOperator(jnp.asarray(a)),
        jnp.zeros(16, jnp.complex128),
        GCRParams(tol=1e-12, max_iter=10),
    )
    assert bool(res.converged)
    assert int(res.n_iters) == 0
    assert float(fields.norm(res.x)) == 0.0


def test_gcr_x0():
    a = _tridiag(32)
    rng = np.random.default_rng(5)
    b = rng.standard_normal(32) + 1j * rng.standard_normal(32)
    x_direct = np.linalg.solve(a, b)
    # start from the exact solution: 0 iterations
    res = gcr_solve(
        DenseOperator(jnp.asarray(a)),
        jnp.asarray(b),
        GCRParams(tol=1e-10, max_iter=50),
        x0=jnp.asarray(x_direct),
    )
    assert int(res.n_iters) == 0 and bool(res.converged)


def test_gcr_jit_and_solver_class():
    a = _tridiag(32)
    rng = np.random.default_rng(7)
    b = jnp.asarray(rng.standard_normal(32) + 1j * rng.standard_normal(32))
    params = GCRParams(tol=1e-10, max_iter=100, restart=8)
    op = DenseOperator(jnp.asarray(a))
    res = gcr_solve_jit(op, b, params)
    assert bool(res.converged)
    solver = GCRSolver(op, params)
    x = solver(b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(res.x), atol=1e-12)


def test_gcr_preconditioned_by_gcr():
    """Solver-as-preconditioner composition (the reference's GCR-inside-GCR
    idiom, SolverParam.h:13-14, main.cpp:776-778)."""
    a = _tridiag(64, seed=9)
    rng = np.random.default_rng(11)
    b = jnp.asarray(rng.standard_normal(64) + 1j * rng.standard_normal(64))
    op = DenseOperator(jnp.asarray(a))
    inner = GCRSolver(op, GCRParams(tol=1e-2, max_iter=5))
    outer = GCRParams(tol=1e-12, max_iter=100, restart=10)
    res = gcr_solve(op, b, outer, precond=inner.as_preconditioner())
    assert bool(res.converged)
    plain = gcr_solve(op, b, outer)
    assert int(res.n_iters) <= int(plain.n_iters)
    np.testing.assert_allclose(
        np.asarray(res.x), np.linalg.solve(a, np.asarray(b)), atol=1e-9
    )


# ---------------------------------------------------------------------------
# reference-fixture convergence (the active experiment, main.cpp:834-875)
# ---------------------------------------------------------------------------
def test_gcr_dirac_4x4_converges(dirac44_ell):
    """Restarted GCR on A = I - k D at moderate k reproduces the reference's
    plain-GCR path (k_critical experiment with the 4^4 matrix, k_c=0.20611)."""
    mesh = LatticeMesh((4, 4, 4, 4, 4, 3))
    a = make_dirac(dirac44_ell, 0.15)
    rhs = fields.random_field(jax.random.PRNGKey(0), mesh)
    params = GCRParams(tol=1e-10, max_iter=500, restart=5)
    res = gcr_solve_jit(a, rhs, params)
    assert bool(res.converged), f"relres={float(res.final_relres)}"
    # independent residual check
    r = rhs - a.apply(res.x)
    rel = float(fields.norm(r) / fields.norm(rhs))
    assert rel <= 1.1e-10


def test_gcr_dirac_4x4_oracle_residual_trajectory(dirac44_csr, dirac44_ell):
    """Residual trajectory matches a float64 numpy re-execution of the same
    algorithm (our oracle replaces the reference's C++ run; SURVEY.md §6)."""
    mesh = LatticeMesh((4, 4, 4, 4, 4, 3))
    k = 0.12
    rhs = np.asarray(fields.random_field(jax.random.PRNGKey(42), mesh))
    n_iter = 30

    # numpy oracle: identical flexible-GCR recurrence, full storage
    def apply_a(v):
        return v - k * dirac44_csr.spmv(v)

    x = np.zeros_like(rhs)
    r = rhs.copy()
    z = r
    p, ap = z, apply_a(z)
    ps, aps = [p], [ap]
    hist = [1.0]
    for _ in range(n_iter):
        alpha = np.vdot(ap, r) / np.vdot(ap, ap)
        x = x + alpha * p
        r = r - alpha * ap
        hist.append(np.linalg.norm(r) / np.linalg.norm(rhs))
        az = apply_a(r)
        betas = [np.vdot(apj, az) / np.vdot(apj, apj) for apj in aps]
        p = r - sum(b * pj for b, pj in zip(betas, ps))
        ap = az - sum(b * apj for b, apj in zip(betas, aps))
        ps.append(p)
        aps.append(ap)

    a = make_dirac(dirac44_ell, k)
    res = gcr_solve_jit(a, jnp.asarray(rhs), GCRParams(tol=0.0, max_iter=n_iter))
    got = res.history_list()
    np.testing.assert_allclose(got, hist, rtol=1e-8)


def test_smallest_eigenpairs():
    """Inverse-iteration eigensolver (the reference's test_EigenSolver,
    main.cpp:145-191, oracle'd by numpy instead of Eigen's JacobiSVD)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from mgpgcr_tpu import fields
    from mgpgcr_tpu.ops.dense import DenseOperator
    from mgpgcr_tpu.solvers.eigen import smallest_eigenpairs
    from mgpgcr_tpu.solvers.params import GCRParams

    rng = np.random.default_rng(3)
    n = 60
    m = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    m = m + m.conj().T + 8.0 * np.eye(n)  # hermitian, well conditioned
    a = DenseOperator(jnp.asarray(m))
    b0 = fields.random_field(jax.random.PRNGKey(1), n)
    res = smallest_eigenpairs(
        None, a, 3, b0, GCRParams(tol=1e-10, max_iter=200, restart=10),
        n_power_iters=30,
    )
    w = np.sort(np.abs(np.linalg.eigvalsh(m)))
    # the first vector converges to the smallest |lambda| eigenpair
    np.testing.assert_allclose(abs(res.values[0]), w[0], rtol=1e-4)
    assert res.residuals[0] < 1e-3


def test_residual_refresh_tightens_true_residual():
    """In f32, periodic true-residual replacement keeps the solver's
    convergence claim honest (recursive residual drifts ~1-2 orders)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from mgpgcr_tpu import cplx
    from mgpgcr_tpu.mesh import LatticeMesh
    from mgpgcr_tpu.ops.dirac import DiracOperator
    from mgpgcr_tpu.ops.wilson import random_links_cf
    from mgpgcr_tpu.ops.wilson_tpu import TpuWilsonDirac
    from mgpgcr_tpu.solvers.gcr import gcr_solve
    from mgpgcr_tpu.solvers.params import GCRParams

    mesh = LatticeMesh((4, 4, 4, 4, 4, 3))
    links = random_links_cf(0, mesh, jnp.float32)
    d = TpuWilsonDirac.build(links, mesh)
    a = DiracOperator(d, cplx.from_scalar(0.15, jnp.float32))
    rhs = cplx.random(jax.random.PRNGKey(7), d.field_shape, jnp.float32)

    def true_rel(res):
        r = rhs - a.apply(res.x)
        return float(jnp.sqrt(cplx.abs2_sum(r) / cplx.abs2_sum(rhs)))

    plain = gcr_solve(a, rhs, GCRParams(tol=1e-6, max_iter=600, restart=5))
    fresh = gcr_solve(
        a, rhs, GCRParams(tol=1e-6, max_iter=600, restart=5, residual_refresh=10)
    )
    assert bool(fresh.converged)
    assert true_rel(fresh) < 5e-6
    assert true_rel(fresh) <= true_rel(plain) * 1.5  # at least as honest


def test_gcr_left_preconditioning():
    """Left preconditioning (SolverParam.h:13-14 'pleft'): GCR runs on
    L(A v), L(b); x still solves the ORIGINAL system, and a good L cuts
    iterations."""
    a = _tridiag(48, seed=5)
    rng = np.random.default_rng(7)
    b = rng.standard_normal(48) + 1j * rng.standard_normal(48)
    aj, bj = jnp.asarray(a), jnp.asarray(b)

    # Jacobi left preconditioner
    dinv = jnp.asarray(1.0 / np.diag(a))
    left = lambda v: dinv * v  # noqa: E731

    params = GCRParams(tol=1e-12, max_iter=300, restart=20)
    res = gcr_solve(DenseOperator(aj), bj, params, left_precond=left)
    assert bool(res.converged)
    x_direct = np.linalg.solve(a, b)
    np.testing.assert_allclose(np.asarray(res.x), x_direct, rtol=0, atol=1e-8)
    # true (unpreconditioned) residual is small too
    r = b - a @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-9


def test_gcr_left_precond_composes_with_right():
    """GCR-as-right-preconditioner under a Jacobi left preconditioner:
    both reference slots (GCR.h:197-204, 245-247) active at once."""
    a = _tridiag(32, seed=11)
    rng = np.random.default_rng(13)
    b = rng.standard_normal(32) + 1j * rng.standard_normal(32)
    aj, bj = jnp.asarray(a), jnp.asarray(b)
    dinv = jnp.asarray(1.0 / np.diag(a))
    left = lambda v: dinv * v  # noqa: E731

    inner = GCRSolver(DenseOperator(aj), GCRParams(tol=0.0, max_iter=4))
    res = gcr_solve(
        DenseOperator(aj),
        bj,
        GCRParams(tol=1e-11, max_iter=100, restart=10),
        precond=inner.as_preconditioner(),
        left_precond=left,
    )
    assert bool(res.converged)
    r = b - a @ np.asarray(res.x)
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-8


@pytest.mark.slow
def test_eager_solver_matches_jitted():
    """gcr_solve_eager (host-orchestrated outer loop for problems whose
    whole-solve jit is too large to compile) reproduces gcr_solve."""
    import jax
    import jax.numpy as jnp

    from mgpgcr_tpu import cplx
    from mgpgcr_tpu.mesh import LatticeMesh
    from mgpgcr_tpu.ops.dirac import DiracOperator
    from mgpgcr_tpu.ops.wilson import random_links_cf
    from mgpgcr_tpu.ops.wilson_tpu import TpuWilsonDirac
    from mgpgcr_tpu.solvers.gcr import gcr_solve, gcr_solve_eager

    mesh = LatticeMesh((4, 4, 2, 4, 4, 3))
    links = random_links_cf(11, mesh, jnp.float32)
    d = TpuWilsonDirac.build(links, mesh)
    a = DiracOperator(d, cplx.from_scalar(0.12, jnp.float32))
    b = cplx.random(jax.random.PRNGKey(5), d.field_shape, jnp.float32)
    p = GCRParams(tol=1e-6, max_iter=200, restart=5)
    e = gcr_solve_eager(a, b, p)
    g = gcr_solve(a, b, p)
    assert int(e.n_iters) == int(g.n_iters)
    assert bool(e.converged)
    r = b - a.apply(e.x)
    rel = float(jnp.sqrt(cplx.abs2_sum(r) / cplx.abs2_sum(b)))
    assert rel < 2e-6
    # full residual-trajectory parity, in particular THROUGH the restart
    # boundaries: the device path keeps the just-built beta-corrected
    # direction when it wipes the stack (GCR.h:277-287), and the eager loop
    # must match (round-2 advisor finding: histories split at restart+1)
    n = int(g.n_iters) + 1
    np.testing.assert_allclose(
        np.asarray(e.res_history[:n]),
        np.asarray(g.res_history[:n]),
        rtol=2e-4,
    )

    # fused eager loop: per-iteration K1/K2/K3 Pallas kernel bundles
    # (round-2 VERDICT item 4) — same trajectory as the jitted fused solve
    ef = gcr_solve_eager(a, b, p, fused=True)
    gf = gcr_solve(a, b, p, fused=True)
    assert bool(ef.converged)
    assert int(ef.n_iters) == int(gf.n_iters)
    nf = int(gf.n_iters) + 1
    np.testing.assert_allclose(
        np.asarray(ef.res_history[:nf]),
        np.asarray(gf.res_history[:nf]),
        rtol=2e-4,
    )
    rf = b - a.apply(ef.x)
    assert float(jnp.sqrt(cplx.abs2_sum(rf) / cplx.abs2_sum(b))) < 2e-6

    # batched convergence checks may overrun by < check_every iterations
    # but must converge to the same answer
    e4 = gcr_solve_eager(a, b, p, fused=True, check_every=4)
    assert bool(e4.converged)
    assert int(e4.n_iters) <= int(gf.n_iters) + 3
    r4 = b - a.apply(e4.x)
    assert float(jnp.sqrt(cplx.abs2_sum(r4) / cplx.abs2_sum(b))) < 2e-6
