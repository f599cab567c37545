"""Latency-optimized small-matrix Cholesky + triangular inverse for TPU.

Why this exists: XLA lowers ``jnp.linalg.cholesky`` and
``solve_triangular`` on TPU through blocked expander loops — at the
[100, 100] scales of sparse-GP inducing matrices and MVN covariance
factors that is ~a hundred tiny sequential kernels per factorization
(each a few microseconds of launch for sub-microsecond math), which is
exactly the op-count bound diagnosed on the SVGP acceptance config
(PERF.md round 4). This module runs the ENTIRE factorization as ONE
Pallas kernel: a fused right-looking Cholesky that simultaneously
accumulates ``L^{-1}`` by applying the inverse elementary column
operations to an identity matrix (every step is a masked whole-matrix
VPU op — no dynamic indexing, no host-visible loop).

With ``L^{-1}`` materialized, every downstream triangular solve becomes
a plain matmul (MXU), and the custom VJP is pure matmuls too:

- ``Linv`` pullback: ``dL -= Linv^T @ dLinv @ Linv^T`` (restricted to
  the lower triangle).
- Cholesky pullback (Murray 2016, "Differentiation of the Cholesky
  decomposition"): ``dA = 0.5 * Linv^T @ (Phi(L^T dL) + Phi(L^T dL)^T)
  @ Linv`` with ``Phi`` = lower triangle with halved diagonal.

Numerical contract: identical algorithm to the textbook factorization
in f32; parity with ``jnp.linalg.cholesky`` + ``solve_triangular`` is
tested to ~1e-5 relative (tests/test_ops_linalg.py), and gradients are
checked against JAX's autodiff of the stock primitives.

Parity note: the reference (/root/reference/zhusuan) has no custom
linalg — it rides ``tf.cholesky``/``tf.matrix_triangular_solve``
(e.g. multivariate.py:169-189). This kernel is a TPU-native
latency optimization, not a reference feature.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["cholesky_inverse", "chol_inv_supported"]

# One [n, n] f32 operand must fit VMEM comfortably alongside ~4 work
# buffers; 512x512 x 4B x ~5 = 5 MB. Above that, XLA's blocked path is
# the right tool anyway (the MXU amortizes launches at large n).
_MAX_N = 512

# Test hook: route eligible shapes through the Pallas kernel in
# interpreter mode on CPU so the kernel body itself is covered by the
# (CPU) test suite.
_FORCE_INTERPRET = False


def chol_inv_supported(n: int, dtype) -> bool:
    """Whether the fused kernel handles this operand (2-D, f32, small)."""
    return bool(n <= _MAX_N and jnp.dtype(dtype) == jnp.float32)


def _chol_inv_kernel(a_ref, l_ref, linv_ref, *, n: int):
    """Fused right-looking Cholesky + inverse accumulation, all in VMEM.

    Per column j (``lax.fori_loop``):
      d       = sqrt(M[j, j])
      L[:, j] = M[:, j] / d           (rows >= j)
      M      -= l_strict @ l_strict^T (trailing Schur complement; the
                row vector comes from M's symmetry — no transposes)
      X       = E_j^{-1} X            (row j scaled by 1/d; rows > j
                minus (L[i,j]/d) * row j) so X ends as L^{-1}.
    """
    M = a_ref[:]
    dtype = M.dtype
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    L0 = jnp.zeros((n, n), dtype)
    X0 = jnp.where(rows == cols, jnp.ones((), dtype),
                   jnp.zeros((), dtype))

    def body(j, carry):
        M, L, X = carry
        is_col = (cols == j).astype(dtype)  # [1, n]
        is_row = (rows == j).astype(dtype)  # [n, 1]
        colM = jnp.sum(M * is_col, axis=1, keepdims=True)  # [n, 1]
        rowM = jnp.sum(M * is_row, axis=0, keepdims=True)  # [1, n]
        d2 = jnp.sum(colM * is_row)
        d = jnp.sqrt(jnp.maximum(d2, jnp.asarray(1e-30, dtype)))
        colL = jnp.where(rows >= j, colM / d, jnp.zeros((), dtype))
        rowL = jnp.where(cols >= j, rowM / d, jnp.zeros((), dtype))
        L = L + colL * is_col
        l_strict = jnp.where(rows > j, colL, jnp.zeros((), dtype))
        r_strict = jnp.where(cols > j, rowL, jnp.zeros((), dtype))
        M = M - l_strict * r_strict
        # inverse accumulation: X := E_j^{-1} X
        rowX = jnp.sum(X * is_row, axis=0, keepdims=True)  # [1, n] (old)
        X = X - (l_strict / d) * rowX
        X = X + (rowX / d - rowX) * is_row
        return M, L, X

    _, L, X = jax.lax.fori_loop(0, n, body, (M, L0, X0))
    l_ref[:] = L
    linv_ref[:] = X


def _chol_inv_pallas(a, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = a.shape[0]
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_chol_inv_kernel, n=n),
        in_specs=[spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((n, n), a.dtype)] * 2,
        interpret=interpret,
    )(a)
    return out[0], out[1]


def _chol_inv_reference(a):
    l = jnp.linalg.cholesky(a)
    eye = jnp.eye(a.shape[-1], dtype=a.dtype)
    linv = jax.scipy.linalg.solve_triangular(l, eye, lower=True)
    return l, linv


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


@jax.custom_vjp
def cholesky_inverse(a):
    """``(L, L^{-1})`` of a symmetric positive-definite ``[n, n]`` matrix
    as ONE TPU kernel (f32, n <= 512); falls back to
    ``jnp.linalg.cholesky`` + ``solve_triangular`` on CPU or unsupported
    shapes. Returning the inverse factor turns every downstream
    triangular solve into an MXU matmul — the op-count cure for
    small-matrix GP/MVN pipelines (PERF.md).

    The VJP is closed-form in ``(L, L^{-1})`` and consists of matmuls
    only (module docstring), so the backward pass adds no sequential
    factorization kernels either.
    """
    eligible = (a.ndim == 2 and a.shape[0] == a.shape[1]
                and chol_inv_supported(a.shape[0], a.dtype))
    if eligible and _FORCE_INTERPRET:
        return _chol_inv_pallas(a, interpret=True)
    if eligible and _on_tpu():
        return _chol_inv_pallas(a)
    return _chol_inv_reference(a)


def _phi(x):
    """Lower triangle with halved diagonal (Cholesky-pullback helper)."""
    return jnp.tril(x) - 0.5 * x * jnp.eye(x.shape[-1], dtype=x.dtype)


def _chol_inv_fwd(a):
    out = cholesky_inverse(a)
    return out, out


def _chol_inv_bwd(res, grads):
    l, linv = res
    dl, dlinv = grads
    dl_total = jnp.zeros_like(l)
    if dl is not None:
        dl_total = dl_total + dl
    if dlinv is not None:
        # Y = L^{-1}:  L_bar += -Y^T @ Y_bar @ Y^T  (lower triangle)
        dl_total = dl_total - jnp.tril(linv.T @ dlinv @ linv.T)
    p = _phi(l.T @ dl_total)
    da = 0.5 * (linv.T @ (p + p.T) @ linv)
    # A is symmetric: return the symmetric pullback (matches autodiff of
    # cholesky composed with an explicitly symmetric construction).
    return (0.5 * (da + da.T),)


cholesky_inverse.defvjp(_chol_inv_fwd, _chol_inv_bwd)
