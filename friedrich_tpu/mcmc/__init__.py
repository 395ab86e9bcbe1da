"""MCMC over GP hyperparameters (net-new capability; the reference has no
MCMC). Exact-LML targets, chain-parallel HMC/NUTS, diagnostics."""

from .diagnostics import ess, rhat, summary
from .distributed_logprob import (
    make_distributed_hyperparam_logprob,
    sample_hyperparameters_distributed,
)
from .hmc import HMCResult, sample_hmc
from .logprob import (
    initial_signs,
    initial_theta,
    make_hyperparam_logprob,
    make_streamed_hyperparam_logprob,
)
from .nuts import NUTSResult, sample_nuts
from .predictive import predictive_mixture, sample_predictive


def sample_hyperparameters(
    gp_or_state,
    key,
    num_warmup: int = 300,
    num_samples: int = 500,
    num_chains: int = 4,
    sampler: str = "nuts",
    backend: str = "auto",
    precision: str | None = None,
    **kwargs,
):
    """Posterior over log-hyperparameters of a trained GP.

    Accepts a ``GaussianProcess`` or a raw ``GPState``; ``sampler`` is
    "nuts" (default) or "hmc". Samples are log([kernel params..., noise]).
    ``backend`` selects the density's inner factorization ("dense",
    "streamed", or "auto" by capacity — see
    :func:`make_hyperparam_logprob`).
    """
    state = getattr(gp_or_state, "state", gp_or_state)
    logp = make_hyperparam_logprob(
        state, signs=initial_signs(state), backend=backend,
        precision=precision,
    )
    theta0 = initial_theta(state)
    fn = sample_nuts if sampler == "nuts" else sample_hmc
    return fn(
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
    "NUTSResult",
    "sample_nuts",
    "initial_theta",
    "initial_signs",
    "make_hyperparam_logprob",
    "make_streamed_hyperparam_logprob",
    "make_distributed_hyperparam_logprob",
    "sample_hyperparameters",
    "sample_hyperparameters_distributed",
    "predictive_mixture",
    "sample_predictive",
]
