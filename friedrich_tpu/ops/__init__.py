"""Compute core (L2): pairwise features, covariance builders, Cholesky ops."""

from .cholesky import (
    cholesky,
    cholesky_append_padded,
    cholesky_with_substitute,
    factor,
)
from .covariance import (
    cross_covariance,
    cross_covariance_train_padded,
    gradient_covariances_padded,
    kernel_diag,
    train_covariance_padded,
)
from .distance import diag_features, pairwise_features

__all__ = [
    "cholesky",
    "cholesky_append_padded",
    "cholesky_with_substitute",
    "factor",
    "cross_covariance",
    "cross_covariance_train_padded",
    "gradient_covariances_padded",
    "kernel_diag",
    "train_covariance_padded",
    "diag_features",
    "pairwise_features",
]
