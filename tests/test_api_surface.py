"""Documented-surface drift guard for docs/API.md.

docs/API.md is a compact table reference (no literal code blocks), so
"doctest the docs" here means: every symbol and method the document
names must exist with the documented callables/signature keywords. If a
rename or removal lands without updating the doc, this fails.
"""

import inspect

import pytest


def _has(obj, *attrs):
    missing = [a for a in attrs if not hasattr(obj, a)]
    assert not missing, f"{obj!r} is missing documented attrs: {missing}"


def _kwargs_of(fn):
    return set(inspect.signature(fn).parameters)


def test_top_level_surface():
    import friedrich_tpu as ft

    _has(
        ft, "GaussianProcess", "GaussianProcessBuilder", "GPState",
        "MultivariateNormal", "kernels", "priors", "enable_x64",
        "CholeskyError", "ShapeError", "ConfigError",
    )


def test_gaussian_process_surface():
    from friedrich_tpu import GaussianProcess as GP

    _has(
        GP, "default", "builder", "new", "predict", "predict_variance",
        "predict_mean_variance", "predict_covariance", "predict_in_batches",
        "sample_at", "add_samples", "fit_parameters", "fit_map",
        "set_hyperparameters", "likelihood", "log_marginal_likelihood",
        "save", "load",
    )
    fit_kwargs = _kwargs_of(GP.fit_parameters)
    assert {
        "fit_prior", "fit_kernel", "max_iter", "convergence_fraction",
        "max_time", "gradient", "num_probes", "seed",
    } <= fit_kwargs
    new_kwargs = _kwargs_of(GP.new)
    assert {
        "method", "capacity", "backend", "storage", "dtype", "panel_block",
        "precision",
    } <= new_kwargs


def test_builder_surface():
    from friedrich_tpu import GaussianProcessBuilder as B

    _has(
        B, "set_prior", "set_noise", "set_kernel", "set_cholesky_epsilon",
        "set_fit_parameters", "set_max_time", "fit_kernel", "fit_prior",
        "set_distance_method", "set_capacity", "set_backend",
        "set_panel_block", "set_dtype", "set_factor_storage",
        "set_factor_precision", "train",
    )


def test_kernels_surface():
    import friedrich_tpu.kernels as fk

    for name in (
        "SquaredExp", "Gaussian", "Exponential", "Matern1", "Matern2",
        "RationalQuadratic", "Multiquadric", "Linear", "Polynomial",
        "HyperTan",
    ):
        _has(fk, name)
    k = fk.SquaredExp(ls=1.0, ampl=1.0)
    _has(
        k, "get_params", "with_params", "nb_params", "is_scalable",
        "rescale", "heuristic_fit", "pointwise", "pointwise_grads",
    )
    # composition operators
    assert (k + fk.Linear(c=0.1)).nb_params == k.nb_params + 1
    assert (k * fk.Linear(c=0.1)).nb_params == k.nb_params + 1


def test_priors_surface():
    import friedrich_tpu.priors as fp

    for name in ("ZeroPrior", "ConstantPrior", "LinearPrior"):
        cls = getattr(fp, name)
        _has(cls, "mean", "fit", "fit_padded", "default")


def test_mcmc_surface():
    import friedrich_tpu.mcmc as mc

    _has(
        mc, "sample_hyperparameters", "sample_nuts", "sample_hmc",
        "make_hyperparam_logprob", "make_distributed_hyperparam_logprob",
        "sample_hyperparameters_distributed", "predictive_mixture",
        "sample_predictive", "rhat", "ess", "summary", "initial_theta",
    )
    from friedrich_tpu.mcmc import sharded

    _has(sharded, "sample_nuts_sharded", "sample_hmc_sharded")


def test_parallel_surface():
    import friedrich_tpu.parallel as par

    _has(
        par, "make_matrix_mesh", "make_chain_mesh", "LargeScaleGP",
        "make_sharded_train_step", "make_sharded_predict",
        "make_sharded_build_and_factor", "shard_state",
    )
    from friedrich_tpu.parallel import large_scale

    _has(
        large_scale.LargeScaleGP, "predict", "predict_variance",
        "predict_mean_variance", "predict_in_batches", "likelihood",
        "log_marginal_likelihood", "sample_at", "add_samples", "grow",
        "fit_scaled", "fit_generic",
    )
    from friedrich_tpu.parallel import multihost

    _has(multihost, "initialize")


def test_outofcore_surface():
    from friedrich_tpu.models import OutOfCoreGP

    _has(
        OutOfCoreGP, "predict", "predict_variance", "predict_mean_variance",
        "predict_in_batches", "sample_at", "likelihood",
        "log_marginal_likelihood", "add_samples", "set_hyperparameters",
        "fit_scaled", "fit_generic",
    )
    from friedrich_tpu.ops import outofcore

    _has(
        outofcore, "outofcore_cholesky_factor", "outofcore_solve_lower",
        "outofcore_solve_lower_t", "outofcore_cho_solve",
    )


def test_ops_surface():
    from friedrich_tpu import ops

    from friedrich_tpu.ops.covariance import (  # noqa: F401
        cross_covariance, train_covariance_padded,
        gradient_covariances_padded, kernel_diag,
    )
    from friedrich_tpu.ops.streamed import streamed_cholesky_factor
    from friedrich_tpu.ops.tiled import tiled_cholesky_factor  # noqa: F401
    from friedrich_tpu.ops.hybrid import hybrid_cholesky_factor
    from friedrich_tpu.ops.cholesky import (  # noqa: F401
        cholesky_with_substitute, cholesky_append_padded,
    )
    from friedrich_tpu.ops.blocked_solve import (  # noqa: F401
        blocked_solve_lower, blocked_solve_lower_t, blocked_cho_solve,
    )
    from friedrich_tpu.ops.streamed_matvec import streamed_grad_matvec  # noqa: F401
    from friedrich_tpu.ops.partition import (  # noqa: F401
        auto_panel_block, auto_diag_blocks, pick_block,
    )

    assert {"unroll", "l0", "precision", "storage", "solve_blocks",
            "diag_blocks"} <= _kwargs_of(streamed_cholesky_factor)
    assert "levels" in _kwargs_of(hybrid_cholesky_factor)


def test_serving_surface():
    from friedrich_tpu import serving

    _has(
        serving, "export_bundle", "GPServer", "AcceleratedGPServer",
        "GPClient",
    )


def test_native_surface():
    from friedrich_tpu import native

    _has(native, "NativeGP", "cov_matrix", "train_cov", "cholesky",
         "solve_lower")


def test_utils_surface():
    from friedrich_tpu.utils import debugging, fitlog, profiling, serialization

    _has(fitlog, "FitLog", "mcmc_summary_table")
    _has(profiling, "annotate", "scope", "timed", "start_trace")
    _has(debugging, "debug_nans", "checksum")
    _has(serialization, "save_gp", "load_gp")


def test_config_surface():
    from friedrich_tpu import config

    _has(config, "matmul_precision", "MATMUL_PRECISION_MODES")
