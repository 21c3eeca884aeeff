from .base import KernelFamily, sqdist, weighted_eval
from .combinators import (
    cols_family,
    parse_family,
    product_family,
    sum_family,
)
from .cosine import Cosine
from .se_ard import SeArd
from .sm_init import sm_init_from_data, sm_spectrum
from .task import task_family
from .const import Const
from .lin_ard import LinArd
from .lin_one import LinOne
from .matern import Matern32, Matern52
from .periodic import Periodic
from .rq import RatQuad
from .se_fat import SeFat
from .se_iso import SeIso

#: Registry by name, mirroring the reference's five covariance modules
#: (SURVEY.md section 2.1).
FAMILIES = {
    Const.name: Const,
    LinOne.name: LinOne,
    LinArd.name: LinArd,
    SeIso.name: SeIso,
    SeFat.name: SeFat,
    # extensions beyond the reference's five
    Matern32.name: Matern32,
    Matern52.name: Matern52,
    RatQuad.name: RatQuad,
    Periodic.name: Periodic,
    SeArd.name: SeArd,
    Cosine.name: Cosine,
}

def sm_family(q: int):
    """Spectral-mixture kernel with ``q`` components (Wilson & Adams 2013,
    vector-mean form): sum of q ``prod(se_ard, cosine)`` terms — each a
    Gaussian spectral peak with learnable location (cosine.mu), widths
    (se_ard lengthscales) and weight (se_ard sf2).  Components get
    DISTINCT random inits through the combinator's per-term key split.
    Structural name round-trips via ``resolve_family``."""
    if q < 1:
        raise ValueError("sm_family needs q >= 1")
    comp = product_family(SeArd, Cosine)
    if q == 1:
        return comp
    return sum_family(*([comp] * q))


def icm_family(data_family, n_features: int, n_tasks: int, rank: int = 1):
    """Intrinsic coregionalization model over stacked multi-output rows
    ``[features..., task_id]``:  k = B[t,t'] * k_data(x, x')  with
    B = W W' + diag (kernels/task.py).  Structural name round-trips
    through ``resolve_family`` like every combinator."""
    return product_family(
        cols_family(task_family(n_tasks, rank), n_features, n_features + 1),
        cols_family(data_family, 0, n_features),
    )


def resolve_family(name: str):
    """Family object for ``name``: a base family or a structural
    combinator name like ``sum(se_iso,lin_ard)`` (see
    kernels/combinators.py).  The inverse of ``family.name``."""
    return parse_family(name, FAMILIES)


__all__ = [
    "KernelFamily",
    "sqdist",
    "weighted_eval",
    "sum_family",
    "product_family",
    "cols_family",
    "task_family",
    "icm_family",
    "sm_family",
    "sm_init_from_data",
    "sm_spectrum",
    "SeArd",
    "Cosine",
    "resolve_family",
    "Const",
    "LinOne",
    "LinArd",
    "SeIso",
    "SeFat",
    "Matern32",
    "Matern52",
    "Periodic",
    "RatQuad",
    "FAMILIES",
]
