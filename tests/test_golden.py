"""Frozen golden values on the reference README dataset
(``main.rs:16-17``): detects behavioral drift across refactors.

These numbers were produced by the fully-parity-tested round-1 engine
(every constituent — heuristics, scaled ADAM trajectory, predict paths,
likelihood — is independently pinned to the reference formulas via the
direct-loop oracle in this suite). Since round 2 the *standard* math those
trajectories are built from is additionally grounded against third-party
implementations: scikit-learn for kernel matrices / posteriors / exact LML
(``test_sklearn_crosscheck.py``) and central finite differences for every
true-derivative kernel gradient (``test_gradcheck.py``), so these goldens
rest on more than this repo's own transcriptions. Tolerances are loose
enough to survive benign reduction-order changes but catch formula/logic
regressions.
"""

import numpy as np

import friedrich_tpu as ft

README_X = [[0.8], [1.2], [3.8], [4.2]]
README_Y = [3.0, 4.0, -2.0, -2.0]

GOLDEN = {
    "params": [0.8540556470232996, 5.123919099878135],  # [ls, ampl]
    "noise": 0.2995900423631109,
    "pred": [3.5490314408831614, 3.133998799657848, -0.2600247938749769],
    "var": [0.0545010317451915, 2.066876116249336, 2.066876116249348],
    "likelihood": -8.940086505894211,
    "lml": -7.445250761293123,
}


def test_default_gp_matches_golden_values():
    gp = ft.GaussianProcess.default(README_X, README_Y)
    np.testing.assert_allclose(
        np.asarray(gp.kernel.get_params()), GOLDEN["params"], rtol=1e-9
    )
    np.testing.assert_allclose(gp.noise, GOLDEN["noise"], rtol=1e-9)
    np.testing.assert_allclose(
        gp.predict([[1.0], [2.0], [3.0]]), GOLDEN["pred"], rtol=1e-9
    )
    np.testing.assert_allclose(
        gp.predict_variance([[1.0], [2.0], [3.0]]), GOLDEN["var"], rtol=1e-8
    )
    np.testing.assert_allclose(gp.likelihood(), GOLDEN["likelihood"], rtol=1e-9)
    np.testing.assert_allclose(gp.log_marginal_likelihood(), GOLDEN["lml"], rtol=1e-9)
