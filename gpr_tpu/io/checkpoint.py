"""Model persistence: versioned npz artifacts.

The reference persists a trained model as an OCaml ``Marshal`` blob of
``{sigma2; target_mean; input_means; input_stddevs; kernel; inducing_points;
coeffs; co_variance_coeffs}`` (bin/ocaml_gpr.ml:179-228) — compact but
brittle across versions, a deficiency SURVEY.md flags to not reproduce.
Here the same record (plus optional optimizer state, making *training*
resumable, which the reference cannot do) is a flat npz with a json manifest:
every leaf is a named numpy array, static structure lives in the manifest,
and a schema version gates loading.
"""

from __future__ import annotations

import dataclasses
import json

import jax.numpy as jnp
import numpy as np

from ..kernels import resolve_family

SCHEMA_VERSION = 1


@dataclasses.dataclass(frozen=True)
class ModelArtifact:
    """Everything needed to serve means and (co)variances, exactly matching
    the reference's record plus the factor matrices."""

    family_name: str
    kernel_params: object
    inducing: np.ndarray  # inducing representation (m, dz)
    coeffs: np.ndarray  # (m,)
    chol_km: np.ndarray  # (m, m) upper
    r_mat: np.ndarray  # (m, m) upper
    sigma2: float
    target_mean: float
    input_means: np.ndarray  # (d,)
    input_stddevs: np.ndarray  # (d,)

    @property
    def family(self):
        return resolve_family(self.family_name)


def _params_to_arrays(params, prefix: str = ""):
    """Flatten a (possibly nested) params dataclass to dotted-name arrays.

    Combinator params (kernels/combinators.py) hold a tuple of per-term
    dataclasses under ``terms``; those flatten to ``terms.0.log_ell`` etc.
    Base-family params keep their round-1 flat names, so old artifacts
    load unchanged.
    """
    out, static = {}, {}
    for f in dataclasses.fields(params):
        v = getattr(params, f.name)
        key = prefix + f.name
        if dataclasses.is_dataclass(v) and not isinstance(v, type):
            o, s = _params_to_arrays(v, key + ".")
            out.update(o)
            static.update(s)
        elif (
            isinstance(v, tuple)
            and v
            and all(dataclasses.is_dataclass(t) for t in v)
        ):
            for i, t in enumerate(v):
                o, s = _params_to_arrays(t, f"{key}.{i}.")
                out.update(o)
                static.update(s)
        elif v is None:
            static[key] = None
        elif isinstance(v, (int, float)) and not hasattr(v, "shape"):
            static[key] = v
        else:
            out[key] = np.asarray(v)
    return out, static


def _params_from_arrays(family, static: dict, arrays: dict, prefix: str = ""):
    """Inverse of ``_params_to_arrays``, structure-directed by the family."""
    terms = getattr(family, "terms", None)
    if terms is not None:
        tp = tuple(
            _params_from_arrays(t, static, arrays, f"{prefix}terms.{i}.")
            for i, t in enumerate(terms)
        )
        return family.Params(terms=tp)
    kw = {}
    for src, conv in ((static, lambda v: v), (arrays, jnp.asarray)):
        for key, v in src.items():
            if key.startswith(prefix) and "." not in key[len(prefix):]:
                kw[key[len(prefix):]] = conv(v)
    return family.Params(**kw)


def save_model(path: str, art: ModelArtifact, extra_arrays: dict | None = None):
    params_arrays, params_static = _params_to_arrays(art.kernel_params)
    manifest = {
        "schema_version": SCHEMA_VERSION,
        "family": art.family_name,
        "sigma2": float(art.sigma2),
        "target_mean": float(art.target_mean),
        "params_static": params_static,
        "params_arrays": sorted(params_arrays),
        "extra": sorted(extra_arrays) if extra_arrays else [],
    }
    arrays = {
        "inducing": np.asarray(art.inducing),
        "coeffs": np.asarray(art.coeffs),
        "chol_km": np.asarray(art.chol_km),
        "r_mat": np.asarray(art.r_mat),
        "input_means": np.asarray(art.input_means),
        "input_stddevs": np.asarray(art.input_stddevs),
    }
    arrays.update({f"param__{k}": v for k, v in params_arrays.items()})
    if extra_arrays:
        arrays.update({f"extra__{k}": np.asarray(v) for k, v in extra_arrays.items()})
    arrays["manifest"] = np.frombuffer(
        json.dumps(manifest).encode(), dtype=np.uint8
    )
    with open(path, "wb") as fh:
        np.savez(fh, **arrays)


def load_model(path: str) -> tuple[ModelArtifact, dict]:
    with np.load(path) as z:
        manifest = json.loads(bytes(z["manifest"].tobytes()).decode())
        if manifest["schema_version"] > SCHEMA_VERSION:
            raise ValueError(
                f"model schema {manifest['schema_version']} is newer than "
                f"supported {SCHEMA_VERSION}"
            )
        family = resolve_family(manifest["family"])
        params = _params_from_arrays(
            family,
            manifest["params_static"],
            {name: z[f"param__{name}"] for name in manifest["params_arrays"]},
        )
        art = ModelArtifact(
            family_name=manifest["family"],
            kernel_params=params,
            inducing=z["inducing"],
            coeffs=z["coeffs"],
            chol_km=z["chol_km"],
            r_mat=z["r_mat"],
            sigma2=manifest["sigma2"],
            target_mean=manifest["target_mean"],
            input_means=z["input_means"],
            input_stddevs=z["input_stddevs"],
        )
        extra = {k: z[f"extra__{k}"] for k in manifest["extra"]}
    return art, extra


def artifact_from_trained(
    family, trained, *, target_mean=0.0, input_means=None, input_stddevs=None,
    kernel_params,
) -> ModelArtifact:
    model = trained.model
    z = model.inducing.z
    d = z.shape[1] if z.ndim == 2 else 1
    return ModelArtifact(
        family_name=family.name,
        kernel_params=kernel_params,
        inducing=np.asarray(z),
        coeffs=np.asarray(trained.coeffs),
        chol_km=np.asarray(model.inducing.chol_km),
        r_mat=np.asarray(model.r_mat),
        sigma2=float(model.sigma2),
        target_mean=float(target_mean),
        input_means=np.asarray(
            input_means if input_means is not None else np.zeros(d)
        ),
        input_stddevs=np.asarray(
            input_stddevs if input_stddevs is not None else np.ones(d)
        ),
    )
