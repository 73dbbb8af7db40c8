"""Flat-vector packing of the MAGI sampler state.

The NUTS core (sampler/nuts.py) works on a flat position vector; the MAGI
state is (X (N_I, D), sigma_sqs_pre (D,), thetas_pre (D_thetas,)), packed in
that order — the same three blocks as the reference's initial_state list
(magi_v2.py:383)."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from magi_v2_tpu.posterior import PosteriorData, log_posterior


def flatten_state(X, sigma_sqs_pre, thetas_pre):
    return jnp.concatenate([X.reshape(-1), sigma_sqs_pre, thetas_pre])


def unflatten_state(q, N_I: int, D: int, D_thetas: int):
    X = q[: N_I * D].reshape(N_I, D)
    sigma_sqs_pre = q[N_I * D : N_I * D + D]
    thetas_pre = q[N_I * D + D :]
    return X, sigma_sqs_pre, thetas_pre


def unflatten_samples(samples, N_I: int, D: int, D_thetas: int):
    """(T, C, dim) -> (X (T,C,N_I,D), sigma_pre (T,C,D), theta_pre (T,C,Dθ))."""
    T, C = samples.shape[:2]
    X = samples[..., : N_I * D].reshape(T, C, N_I, D)
    sigma = samples[..., N_I * D : N_I * D + D]
    theta = samples[..., N_I * D + D :]
    return X, sigma, theta


def make_tempered_logp_grad(
    data: PosteriorData, f_vec: Callable, N_I: int, D: int, D_thetas: int
):
    """(q, beta_temp) -> (logp, dlogp/dq), the fused evaluation NUTS calls."""

    def lp(q, beta_temp):
        X, sigma_pre, theta_pre = unflatten_state(q, N_I, D, D_thetas)
        return log_posterior(data, f_vec, X, sigma_pre, theta_pre, beta_temp)

    vag = jax.value_and_grad(lp, argnums=0)

    def logp_grad(q, beta_temp):
        return vag(q, beta_temp)

    return logp_grad
