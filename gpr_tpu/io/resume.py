"""Resumable training: checkpoint the optimizer state alongside the model.

The reference's model file stores only the predictor — "training resume
doesn't exist" (SURVEY.md section 5).  Here a training checkpoint is the
packed hyper vector plus the L-BFGS curvature history, so an interrupted run
continues with the same quasi-Newton memory it stopped with.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..optim.lbfgs import LBFGSHostState
from ..optim.lbfgs_device import LBFGSDeviceState


# ---------------------------------------------------------------------------
# Host train() loop (optim.train / optim.lbfgs.minimize_lbfgs)
# ---------------------------------------------------------------------------


def save_train_checkpoint(
    path: str, st: LBFGSHostState, *, best_x=None, best_le=None
):
    """Persist the host L-BFGS state (+ best-model-so-far tracking) as a
    plain npz.  Resuming with :func:`load_train_checkpoint` on the SAME
    objective reproduces the uninterrupted trajectory exactly."""
    k = len(st.s_hist)
    n = st.x.shape[0]
    arrays = {
        "x": np.asarray(st.x, np.float64),
        "f": np.asarray(st.f, np.float64),
        "g": np.asarray(st.g, np.float64),
        "s_hist": (np.stack(st.s_hist) if k else np.zeros((0, n))),
        "y_hist": (np.stack(st.y_hist) if k else np.zeros((0, n))),
        "rho_hist": np.asarray(st.rho_hist, np.float64),
        "n_iter": np.asarray(st.n_iter, np.int64),
        "best_x": np.asarray(best_x if best_x is not None else st.x,
                             np.float64),
        "best_le": np.asarray(
            best_le if best_le is not None else -st.f, np.float64
        ),
    }
    # atomic replace: a crash mid-write must not corrupt the only copy —
    # the checkpoint exists precisely for the crash scenario
    import os

    tmp = f"{path}.tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, **arrays)
    os.replace(tmp, path)


def load_train_checkpoint(path: str):
    """Returns (LBFGSHostState, best_x, best_le)."""
    with np.load(path) as z:
        st = LBFGSHostState(
            x=z["x"],
            f=float(z["f"]),
            g=z["g"],
            s_hist=list(z["s_hist"]),
            y_hist=list(z["y_hist"]),
            rho_hist=[float(r) for r in z["rho_hist"]],
            n_iter=int(z["n_iter"]),
        )
        return st, z["best_x"], float(z["best_le"])


# ---------------------------------------------------------------------------
# Device fit() loop (optim.lbfgs_device)
# ---------------------------------------------------------------------------


def training_state_arrays(st: LBFGSDeviceState) -> dict[str, np.ndarray]:
    """Flatten an LBFGSDeviceState for io.checkpoint.save_model's
    ``extra_arrays``."""
    return {
        "lbfgs_x": np.asarray(st.x),
        "lbfgs_f": np.asarray(st.f),
        "lbfgs_g": np.asarray(st.g),
        "lbfgs_s_hist": np.asarray(st.s_hist),
        "lbfgs_y_hist": np.asarray(st.y_hist),
        "lbfgs_rho": np.asarray(st.rho),
        "lbfgs_head": np.asarray(st.head),
        "lbfgs_n_iter": np.asarray(st.n_iter),
        "lbfgs_n_evals": np.asarray(st.n_evals),
    }


def training_state_from_arrays(extra: dict) -> LBFGSDeviceState:
    """Rebuild the optimizer state saved by :func:`training_state_arrays`."""
    return LBFGSDeviceState(
        x=jnp.asarray(extra["lbfgs_x"]),
        f=jnp.asarray(extra["lbfgs_f"]),
        g=jnp.asarray(extra["lbfgs_g"]),
        s_hist=jnp.asarray(extra["lbfgs_s_hist"]),
        y_hist=jnp.asarray(extra["lbfgs_y_hist"]),
        rho=jnp.asarray(extra["lbfgs_rho"]),
        head=jnp.asarray(extra["lbfgs_head"], jnp.int32),
        n_iter=jnp.asarray(extra["lbfgs_n_iter"], jnp.int32),
        failed=jnp.asarray(False),
        # absent in pre-eval-counter checkpoints
        n_evals=jnp.asarray(extra.get("lbfgs_n_evals", 0), jnp.int32),
    )


def save_device_checkpoint(path: str, st: LBFGSDeviceState):
    """Persist a device L-BFGS state as a standalone npz (atomic replace —
    same crash-safety contract as :func:`save_train_checkpoint`).  Used by
    fit(checkpoint via state_callback) and the CLI's -trainer device."""
    import os

    tmp = f"{path}.tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, **training_state_arrays(st))
    os.replace(tmp, path)


def load_device_checkpoint(path: str) -> LBFGSDeviceState:
    """Rebuild the state saved by :func:`save_device_checkpoint`."""
    with np.load(path) as z:
        return training_state_from_arrays({k: z[k] for k in z.files})


def resume_minimize(fg, st: LBFGSDeviceState, **kw):
    """Continue a device L-BFGS run from a restored state.

    The FULL state resumes — incumbent x, gradient, and the curvature
    history (minimize_lbfgs_device's ``init_state``), so no line searches
    are lost.  The cumulative iteration count carries through ``st.n_iter``;
    callers passing ``max_iter`` mean it as a TOTAL across the original run
    and the resume.  ``history`` is taken from the saved buffers (a
    mismatched override would scramble the circular-buffer indexing)."""
    from ..optim.lbfgs_device import minimize_lbfgs_device

    kw.setdefault("history", int(st.s_hist.shape[0]))
    if kw["history"] != int(st.s_hist.shape[0]):
        raise ValueError(
            f"history={kw['history']} does not match the checkpointed "
            f"curvature buffers ({int(st.s_hist.shape[0])})"
        )
    return minimize_lbfgs_device(
        fg, st.x, init_state=st._replace(failed=jnp.asarray(False)), **kw
    )
