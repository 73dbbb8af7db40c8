"""Banded precision operators: storage, conversion, and matvec/quadratic
forms with O(N*b) cost — Pallas TPU kernel with an XLA fallback.

The reference's ``bandsize`` option truncates C^{-1}, K^{-1}, m to a band but
keeps storing and multiplying them DENSE (magi_v2.py:271-274; SURVEY.md §5),
so only the statistics change, not the FLOPs or memory. Here the band is
real: diagonal-offset storage (D, 2b+1, N) and a shifted multiply-accumulate
matvec, which turns the O(N^2) per-leapfrog cost into O(N*b) and the
O(D*N^2) memory into O(D*N*b) — the honest "blockwise attention" analog for
this workload, and what makes N_I >= 4k grids (Lorenz dense config) fit on
chip.

Performance note (v5e): for N_I up to ~2k the dense batched matvec rides the
MXU and wins; the banded path is the memory/scaling mode. The Pallas kernel
processes (rows x N) tiles in VMEM, accumulating the 2b+1 shifted diagonal
products on the VPU without materializing shifted copies in HBM.

Autodiff: matvec is linear; the VJP is a banded matvec with the transposed
band (flip the diagonal axis and shift each diagonal), wired via custom_vjp
so gradients flow through the Pallas kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# banded storage
# ---------------------------------------------------------------------------

def dense_to_banded(A, bandwidth: int):
    """(..., N, N) dense -> (..., 2b+1, N) diagonal-offset storage.

    band[..., b + k, i] = A[..., i, i + k] for k in [-b, b] (zero-padded
    outside the matrix).
    """
    A = jnp.asarray(A)
    N = A.shape[-1]
    b = bandwidth
    rows = []
    for k in range(-b, b + 1):
        diag = jnp.diagonal(A, offset=k, axis1=-2, axis2=-1)
        # diag has length N - |k|; pad so that entry i corresponds to row i
        pad_before = max(0, -k) * 0 if k >= 0 else 0
        if k >= 0:
            pad = (0, k)
        else:
            pad = (-k, 0)
        widths = [(0, 0)] * (A.ndim - 2) + [pad]
        rows.append(jnp.pad(diag, widths))
    return jnp.stack(rows, axis=-2)


def banded_to_dense(band):
    """Inverse of dense_to_banded (for tests)."""
    band = np.asarray(band)
    *lead, two_b1, N = band.shape
    b = (two_b1 - 1) // 2
    out = np.zeros((*lead, N, N), band.dtype)
    for k in range(-b, b + 1):
        d = band[..., b + k, :]
        for i in range(max(0, -k), min(N, N - k)):
            out[..., i, i + k] = d[..., i]
    return out


# ---------------------------------------------------------------------------
# XLA reference implementation (also the CPU/interpret fallback)
# ---------------------------------------------------------------------------

def _banded_matvec_xla(band, x):
    """y[i] = sum_k band[b+k, i] * x[i+k]; shapes (..., 2b+1, N), (..., N)."""
    two_b1, N = band.shape[-2], band.shape[-1]
    b = (two_b1 - 1) // 2
    y = jnp.zeros_like(x)
    for k in range(-b, b + 1):
        xs = jnp.roll(x, -k, axis=-1)
        # zero the wrapped-around region
        idx = jnp.arange(N)
        valid = (idx + k >= 0) & (idx + k < N)
        y = y + band[..., b + k, :] * jnp.where(valid, xs, 0.0)
    return y


def transpose_band(band):
    """Banded storage of A^T given banded storage of A.

    (A^T)[i, i+k] = A[i+k, i] -> band_T[b+k, i] = band[b-k, i+k]."""
    two_b1 = band.shape[-2]
    b = (two_b1 - 1) // 2
    rows = []
    for k in range(-b, b + 1):
        src = band[..., b - k, :]
        rows.append(jnp.roll(src, -k, axis=-1))
    out = jnp.stack(rows, axis=-2)
    # rolled-in garbage is multiplied by out-of-range x in matvec only when
    # |i+k| outside [0,N) — masked there, so no cleanup needed; but zero it
    # anyway for exactness of the stored representation
    N = band.shape[-1]
    idx = jnp.arange(N)
    ks = jnp.arange(-b, b + 1).reshape((1,) * (band.ndim - 2) + (two_b1, 1))
    valid = (idx + ks >= 0) & (idx + ks < N)
    return jnp.where(valid, out, 0.0)


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------

def _banded_matvec_kernel(band_ref, x_ref, out_ref):
    """One (batch) program: band (2b+1, N), x (1, N) -> y (1, N).

    The shifted accumulate runs on the VPU; diagonals stream from VMEM.
    """
    two_b1 = band_ref.shape[0]
    N = band_ref.shape[1]
    b = (two_b1 - 1) // 2
    x = x_ref[0, :]
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)[0]

    def body(j, acc):
        k = j - b
        # x shifted by k with zero fill (pltpu.roll wraps; mask the wrap)
        xs = jnp.roll(x, -k)
        valid = (idx + k >= 0) & (idx + k < N)
        return acc + band_ref[j, :] * jnp.where(valid, xs, 0.0)

    acc = jnp.zeros_like(x)
    acc = jax.lax.fori_loop(0, two_b1, body, acc)
    out_ref[0, :] = acc


def _banded_matvec_pallas(band, x):
    """Batched banded matvec: band (B, 2b+1, N), x (B, N) -> (B, N)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, two_b1, N = band.shape
    return pl.pallas_call(
        _banded_matvec_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, two_b1, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), x.dtype),
    )(band.reshape(B, two_b1, N), x)


def _use_pallas():
    return jax.default_backend() == "tpu"


@jax.custom_vjp
def banded_matvec(band, x):
    """y = A @ x with A in banded storage.

    band: (..., 2b+1, N), x: (..., N) with broadcast-compatible leading dims.
    """
    return _banded_matvec_impl(band, x)


def _banded_matvec_impl(band, x):
    band_b, x_b = jnp.broadcast_shapes(band.shape[:-2], x.shape[:-1]), None
    lead = jnp.broadcast_shapes(band.shape[:-2], x.shape[:-1])
    two_b1, N = band.shape[-2], band.shape[-1]
    bandf = jnp.broadcast_to(band, lead + (two_b1, N)).reshape(-1, two_b1, N)
    xf = jnp.broadcast_to(x, lead + (N,)).reshape(-1, N)
    if _use_pallas():
        # kernel wants >= 2D blocks; Pallas path
        yf = _banded_matvec_pallas(bandf, xf)
    else:
        yf = _banded_matvec_xla(bandf, xf)
    return yf.reshape(lead + (N,))


def _banded_matvec_fwd(band, x):
    return _banded_matvec_impl(band, x), (band, x)


def _banded_matvec_bwd(res, g):
    band, x = res
    # d/dx: A^T g  (banded matvec with transposed band)
    band_t = transpose_band(band)
    gx = _banded_matvec_impl(band_t, g)
    # d/dband[b+k, i] = g[i] * x[i+k]
    two_b1, N = band.shape[-2], band.shape[-1]
    b = (two_b1 - 1) // 2
    idx = jnp.arange(N)
    rows = []
    for k in range(-b, b + 1):
        xs = jnp.roll(x, -k, axis=-1)
        valid = (idx + k >= 0) & (idx + k < N)
        rows.append(g * jnp.where(valid, xs, 0.0))
    gband = jnp.stack(rows, axis=-2)
    # un-broadcast to original shapes
    gx = _sum_to_shape(gx, x.shape)
    gband = _sum_to_shape(gband, band.shape)
    return gband, gx


def _sum_to_shape(v, shape):
    extra = v.ndim - len(shape)
    if extra > 0:
        v = v.sum(axis=tuple(range(extra)))
    for i, (a, b) in enumerate(zip(v.shape, shape)):
        if a != b:
            v = v.sum(axis=i, keepdims=True)
    return v.reshape(shape)


banded_matvec.defvjp(_banded_matvec_fwd, _banded_matvec_bwd)


def banded_quadratic_form(band, x):
    """x^T A x summed over all leading (batch) axes; A in banded storage."""
    return jnp.sum(x * banded_matvec(band, x))
