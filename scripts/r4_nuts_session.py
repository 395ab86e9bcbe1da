"""Round-4 NUTS chip session (VERDICT #3): ESS/s at realistic n with
>= 16 effective chains via the auto chain_batch envelope, plus the
epsilon-substitute density rung as a cheaper alternative to the 6-pass
f32 density.

Stages (progressive JSON; most important first):
1. f32 density, 16 chains (auto-batched to the measured envelope),
   n in {4096, 8192, 16384}: transitions/s, ESS/s, R-hat, divergence.
2. eps-substitute rung at n=4096: ambient and f32x3 densities with
   cholesky_epsilon at the documented error scale
   (~ n * 2^-15 * ampl^2) — divergence ~ 0 at less than f32's cost is
   the success criterion.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from measure import main as measure_main  # noqa: E402


def run(argv):
    print(f"## measure.py {' '.join(argv)}", flush=True)
    measure_main(argv)


if __name__ == "__main__":
    stages = sys.argv[1:] or ["ladder", "eps"]
    if "ladder" in stages:
        for n in (4096, 8192, 16384):
            run(["nuts", "--gp-n", str(n), "--chains", "16",
                 "--precision", "f32", "--warmup", "100", "--samples",
                 "100"])
    if "eps" in stages:
        n = 4096
        eps = n * 2.0 ** -15  # ampl=1: the documented bf16 error scale
        for prec in ("ambient", "f32x3"):
            run(["nuts", "--gp-n", str(n), "--chains", "16",
                 "--precision", prec, "--eps", str(eps),
                 "--warmup", "100", "--samples", "100"])
