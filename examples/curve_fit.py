"""The reference's README demo: fit y = a x^2 + b x + c with the Ceres-style
Problem API (pyslam QuadraticResidual example, SURVEY.md §2.1)."""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyslam_tpu import Options, Problem, QuadraticResidual


def main():
    rng = np.random.default_rng(0)
    params_true = np.array([1.0, -2.0, 3.0])
    xs = np.linspace(-3, 3, 50)
    ys = np.polyval(params_true, xs) + rng.normal(0, 0.1, xs.shape)

    problem = Problem(Options(max_iters=50))
    for x, y in zip(xs, ys):
        problem.add_residual_block(QuadraticResidual(x, y, 10.0), ["abc"])
    problem.initialize_params({"abc": np.zeros(3)})
    params = problem.solve()
    est = np.asarray(params["abc"])
    print(f"true  {params_true}")
    print(f"est   {est}")
    print(f"cost  {problem.eval_cost():.4f}")
    assert np.allclose(est, params_true, atol=0.1)


if __name__ == "__main__":
    main()
