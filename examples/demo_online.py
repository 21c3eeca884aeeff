"""Online posterior updates demo: grow a sparse GP one batch at a time.

Trains hypers on an initial chunk of the reference's synthetic benchmark,
then folds in the remaining data incrementally (models/online.py) — each
update is O(batch x m^2), no refit — and shows the fit tightening.

Run: python examples/demo_online.py   (CPU f64, a few seconds)
"""

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from gpr_tpu.datasets import gen_data  # noqa: E402
from gpr_tpu.kernels import SeIso  # noqa: E402
from gpr_tpu.models.online import (  # noqa: E402
    online_init,
    online_log_evidence,
    online_predictors,
    online_update,
)
from gpr_tpu.models.predict import predict_means  # noqa: E402
from gpr_tpu.optim.train import train  # noqa: E402


def main():
    Xn, yn, f = gen_data(0, n=1000)
    perm = np.random.default_rng(1).permutation(len(yn))
    Xn, yn, f = Xn[perm], yn[perm], f[perm]
    X, y = jnp.asarray(Xn), jnp.asarray(yn)
    n0 = 400

    # 1. hyper training on the first chunk only
    result = train(SeIso, X[:n0], y[:n0], n_rand_inducing=10,
                   variational=True, max_iter=300, epsabs=1e-3,
                   key=jax.random.PRNGKey(0))
    p, Z, s2 = result.kernel_params, result.inducing, result.sigma2
    print(f"hypers from first {n0} points: ell={float(jnp.exp(p.log_ell)):.3f}"
          f" sf2={float(jnp.exp(p.log_sf2)):.3f} sigma2={float(s2):.3f}")

    # 2. online accumulation of the rest, reporting fit every batch
    st = online_init(SeIso, p, Z, s2)
    st = online_update(SeIso, p, st, X[:n0], y[:n0])
    for lo in range(n0, 1000, 150):
        st = online_update(SeIso, p, st, X[lo:lo + 150], y[lo:lo + 150])
        mp, _ = online_predictors(st)
        mu = predict_means(SeIso, p, mp, X)
        rmse = float(jnp.sqrt(jnp.mean((jnp.asarray(f) - mu) ** 2)))
        print(f"n={min(lo + 150, 1000):4d}: evidence={float(online_log_evidence(st)):9.1f}"
              f"  RMSE vs true f = {rmse:.4f}")


if __name__ == "__main__":
    main()
