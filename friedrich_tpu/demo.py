"""End-to-end usage demo — counterpart of the reference demo binary
(``src/main.rs:12-69``): default GP, predict, likelihood, add_samples +
fit_parameters, multi-prediction, posterior sampling, and a 2-D input case.

Run: ``python -m friedrich_tpu.demo``
"""

from __future__ import annotations

import jax

from . import GaussianProcess, enable_x64


def main() -> None:
    enable_x64()

    # Trains a gaussian process on a dataset of one-dimension vectors.
    training_inputs = [[0.8], [1.2], [3.8], [4.2]]
    training_outputs = [3.0, 4.0, -2.0, -2.0]
    gp = GaussianProcess.default(training_inputs, training_outputs)

    # Predicts the mean and variance of a single point.
    mean = gp.predict([1.0])
    var = gp.predict_variance([1.0])
    print(f"prediction: {mean} ± {var ** 0.5}")

    # Computes the likelihood of the model.
    print(f"likelihood of the current model : {gp.likelihood()}")

    # Updates the model.
    gp.add_samples([[0.0], [1.0], [2.0], [5.0]], [2.0, 3.0, -1.0, -2.0])
    gp.fit_parameters(
        fit_prior=True, fit_kernel=True,
        max_iter=100, convergence_fraction=0.05, max_time=3600,
    )
    print("model is now updated.")

    # Makes several predictions.
    outputs = gp.predict([[1.0], [2.0], [3.0]])
    print(f"predictions: {outputs}")

    # Samples from the posterior distribution.
    sampler = gp.sample_at([[1.0], [2.0]])
    key = jax.random.PRNGKey(42)
    for i in range(1, 6):
        key, sub = jax.random.split(key)
        print(f"sample {i} : {sampler.sample(sub)}")

    # A 2-D input dataset.
    gp2 = GaussianProcess.default(
        [[0.8, 0.1], [1.2, 0.2], [3.8, 0.3], [4.2, 0.5]],
        [3.0, 4.0, -2.0, -2.0],
    )
    mean2 = gp2.predict([1.0, 0.4])
    var2 = gp2.predict_variance([1.0, 0.4])
    print(f"prediction: {mean2} ± {var2 ** 0.5}")


if __name__ == "__main__":
    main()
