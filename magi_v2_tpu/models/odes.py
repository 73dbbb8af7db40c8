"""ODE vector fields for the MAGI benchmark systems.

Contract (reference magi_v2.py:28): ``f_vec(t (N,1), X (N,D), thetas
(D_thetas,)) -> (N,D)``, pure broadcastable JAX. The five systems are the
BASELINE.json benchmark configs: SEIR (vignette.ipynb cell 3), SIRW
(test_magi_script.py:19-45 / sirw_test.ipynb cell 3), FitzHugh-Nagumo, Hes1
(with log-transform variant for the unobserved-component branch), and Lorenz.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp


def seir_f_vec(t, X, thetas):
    """Reduced SEIR: X = (E, I, R), S = 1 - E - I - R implicit, N_pop = 1.

    thetas = (beta, gamma, sigma). Reference: vignette.ipynb cell 3:
        dE/dt = beta*S*I - sigma*E
        dI/dt = sigma*E - gamma*I
        dR/dt = gamma*I
    """
    E, I, R = X[:, 0:1], X[:, 1:2], X[:, 2:3]
    beta, gamma, sigma = thetas[0], thetas[1], thetas[2]
    S = 1.0 - jnp.sum(X, axis=1, keepdims=True)
    return jnp.concatenate(
        [beta * S * I - sigma * E, sigma * E - gamma * I, gamma * I], axis=1
    )


def sirw_f_vec(t, X, thetas):
    """SIRW with waning immunity: X = (S, I, R, W).

    thetas = (beta, phi, xi, chi, kappa). Reference:
    test_magi_script.py:19-45 / sirw_test.ipynb cell 3:
        dS/dt = -beta*S*I + kappa*W
        dI/dt =  beta*S*I - phi*I
        dR/dt =  phi*I - xi*R + chi*I*W
        dW/dt =  xi*R - chi*I*W - kappa*W
    """
    S, I, R, W = X[:, 0:1], X[:, 1:2], X[:, 2:3], X[:, 3:4]
    beta, phi, xi, chi, kappa = (
        thetas[0], thetas[1], thetas[2], thetas[3], thetas[4],
    )
    return jnp.concatenate(
        [
            -beta * S * I + kappa * W,
            beta * S * I - phi * I,
            phi * I - xi * R + chi * I * W,
            xi * R - chi * I * W - kappa * W,
        ],
        axis=1,
    )


def fitzhugh_nagumo_f_vec(t, X, thetas):
    """FitzHugh-Nagumo 2-state oscillator (classic MAGI benchmark; PNAS
    paper Sec. 3 / BASELINE.json configs[1]).

    X = (V, R), thetas = (a, b, c):
        dV/dt = c * (V - V^3/3 + R)
        dR/dt = -(V - a + b*R) / c
    """
    V, R = X[:, 0:1], X[:, 1:2]
    a, b, c = thetas[0], thetas[1], thetas[2]
    return jnp.concatenate(
        [c * (V - V ** 3 / 3.0 + R), -(V - a + b * R) / c], axis=1
    )


def hes1_f_vec(t, X, thetas):
    """Hes1 3-component oscillator (BASELINE.json configs[2]; P observed,
    M observed, H unobserved in the classic benchmark).

    X = (P, M, H), thetas = (a, b, c, d, e, f, g):
        dP/dt = -a*P*H + b*M - c*P
        dM/dt = -d*M + e / (1 + P^2)
        dH/dt = -a*P*H + f / (1 + P^2) - g*H
    """
    P, M, H = X[:, 0:1], X[:, 1:2], X[:, 2:3]
    a, b, c, d, e, f, g = (thetas[i] for i in range(7))
    return jnp.concatenate(
        [
            -a * P * H + b * M - c * P,
            -d * M + e / (1.0 + P ** 2),
            -a * P * H + f / (1.0 + P ** 2) - g * H,
        ],
        axis=1,
    )


def hes1_log_f_vec(t, X, thetas):
    """Hes1 on the log scale: X = (log P, log M, log H).

    The standard MAGI treatment (positivity + multiplicative noise): with
    Y = log X componentwise, dY/dt = (dX/dt)/X.
    """
    P, M, H = jnp.exp(X[:, 0:1]), jnp.exp(X[:, 1:2]), jnp.exp(X[:, 2:3])
    a, b, c, d, e, f, g = (thetas[i] for i in range(7))
    return jnp.concatenate(
        [
            -a * H + b * M / P - c,
            -d + e / (1.0 + P ** 2) / M,
            -a * P + f / ((1.0 + P ** 2) * H) - g,
        ],
        axis=1,
    )


def lotka_volterra_f_vec(t, X, thetas):
    """Lotka-Volterra predator-prey (classic ODE-inference benchmark, used
    across the gradient-matching literature the MAGI paper compares to).

    X = (u, v) prey/predator, thetas = (a, b, c, d):
        du/dt = a*u - b*u*v
        dv/dt = c*u*v - d*v
    """
    u, v = X[:, 0:1], X[:, 1:2]
    a, b, c, d = thetas[0], thetas[1], thetas[2], thetas[3]
    return jnp.concatenate(
        [a * u - b * u * v, c * u * v - d * v], axis=1
    )


def protein_transduction_f_vec(t, X, thetas):
    """Protein signalling transduction pathway (Vyshemirsky & Girolami
    2008), the hard benchmark of the ODE gradient-matching literature
    (used by the MAGI paper's comparison baselines; stiff decay + a
    Michaelis-Menten nonlinearity). Identifiability note: when R_pp stays
    well below Km the MM term ~ (V/Km)*R_pp, so only the ratio V/Km is
    strongly identified — short runs recover k1..k4 but wander the (V, Km)
    ridge (observed in the end-to-end drive; the literature reports the
    same flat direction for this benchmark).

    X = (S, S_d, R, S_R, R_pp), thetas = (k1, k2, k3, k4, V, Km):
        dS/dt    = -k1*S - k2*S*R + k3*S_R
        dS_d/dt  =  k1*S
        dR/dt    = -k2*S*R + k3*S_R + V*R_pp / (Km + R_pp)
        dS_R/dt  =  k2*S*R - k3*S_R - k4*S_R
        dR_pp/dt =  k4*S_R - V*R_pp / (Km + R_pp)
    """
    S, S_d, R, S_R, R_pp = (X[:, i:i + 1] for i in range(5))
    k1, k2, k3, k4, V, Km = (thetas[i] for i in range(6))
    mm = V * R_pp / (Km + R_pp)
    return jnp.concatenate(
        [
            -k1 * S - k2 * S * R + k3 * S_R,
            k1 * S,
            -k2 * S * R + k3 * S_R + mm,
            k2 * S * R - (k3 + k4) * S_R,
            k4 * S_R - mm,
        ],
        axis=1,
    )


def lorenz_f_vec(t, X, thetas):
    """Lorenz chaotic system (BASELINE.json configs[4], dense-grid config).

    X = (x, y, z), thetas = (sigma, rho, beta):
        dx/dt = sigma * (y - x)
        dy/dt = x * (rho - z) - y
        dz/dt = x*y - beta*z
    """
    x, y, z = X[:, 0:1], X[:, 1:2], X[:, 2:3]
    sigma, rho, beta = thetas[0], thetas[1], thetas[2]
    return jnp.concatenate(
        [sigma * (y - x), x * (rho - z) - y, x * y - beta * z], axis=1
    )


@dataclasses.dataclass(frozen=True)
class OdeModel:
    """Metadata bundle for a benchmark system."""

    name: str
    f_vec: Callable
    D: int
    D_thetas: int
    theta_names: tuple
    true_thetas: tuple | None = None  # ground truth where a dataset exists


MODEL_REGISTRY = {
    "seir": OdeModel(
        name="seir",
        f_vec=seir_f_vec,
        D=3,
        D_thetas=3,
        theta_names=("beta", "gamma", "sigma"),
        true_thetas=(6.0, 0.6, 1.8),  # data/SEIR_beta=6_gamma=0.6_sigma=1.8_*
    ),
    "sirw": OdeModel(
        name="sirw",
        f_vec=sirw_f_vec,
        D=4,
        D_thetas=5,
        theta_names=("beta", "phi", "xi", "chi", "kappa"),
    ),
    "fitzhugh_nagumo": OdeModel(
        name="fitzhugh_nagumo",
        f_vec=fitzhugh_nagumo_f_vec,
        D=2,
        D_thetas=3,
        theta_names=("a", "b", "c"),
        true_thetas=(0.2, 0.2, 3.0),
    ),
    "hes1": OdeModel(
        name="hes1",
        f_vec=hes1_f_vec,
        D=3,
        D_thetas=7,
        theta_names=("a", "b", "c", "d", "e", "f", "g"),
        true_thetas=(0.022, 0.3, 0.031, 0.028, 0.5, 20.0, 0.3),
    ),
    "hes1_log": OdeModel(
        name="hes1_log",
        f_vec=hes1_log_f_vec,
        D=3,
        D_thetas=7,
        theta_names=("a", "b", "c", "d", "e", "f", "g"),
        true_thetas=(0.022, 0.3, 0.031, 0.028, 0.5, 20.0, 0.3),
    ),
    "lotka_volterra": OdeModel(
        name="lotka_volterra",
        f_vec=lotka_volterra_f_vec,
        D=2,
        D_thetas=4,
        theta_names=("a", "b", "c", "d"),
        true_thetas=(1.5, 1.0, 1.0, 3.0),
    ),
    "protein_transduction": OdeModel(
        name="protein_transduction",
        f_vec=protein_transduction_f_vec,
        D=5,
        D_thetas=6,
        theta_names=("k1", "k2", "k3", "k4", "V", "Km"),
        # Vyshemirsky & Girolami (2008) model-1 generating values
        true_thetas=(0.07, 0.6, 0.05, 0.3, 0.017, 0.3),
    ),
    "lorenz": OdeModel(
        name="lorenz",
        f_vec=lorenz_f_vec,
        D=3,
        D_thetas=3,
        theta_names=("sigma", "rho", "beta"),
        true_thetas=(10.0, 28.0, 8.0 / 3.0),
    ),
}
