"""MCMC over GP hyperparameters (net-new capability; the reference has no
MCMC). Exact-LML targets, chain-parallel HMC/NUTS, diagnostics."""

from .diagnostics import ess, rhat, summary
from .hmc import HMCResult, sample_hmc
from .logprob import initial_theta, make_hyperparam_logprob


def sample_hyperparameters(
    gp_or_state,
    key,
    num_warmup: int = 300,
    num_samples: int = 500,
    num_chains: int = 4,
    **kwargs,
):
    """Posterior over log-hyperparameters of a trained GP.

    Accepts a ``GaussianProcess`` or a raw ``GPState``; returns an
    :class:`HMCResult` whose samples are log([kernel params..., noise]).
    """
    state = getattr(gp_or_state, "state", gp_or_state)
    logp = make_hyperparam_logprob(state)
    theta0 = initial_theta(state)
    return sample_hmc(
        logp,
        theta0,
        key,
        num_warmup=num_warmup,
        num_samples=num_samples,
        num_chains=num_chains,
        **kwargs,
    )


__all__ = [
    "ess",
    "rhat",
    "summary",
    "HMCResult",
    "sample_hmc",
    "initial_theta",
    "make_hyperparam_logprob",
    "sample_hyperparameters",
]
