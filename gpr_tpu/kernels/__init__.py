from .base import KernelFamily, sqdist, weighted_eval
from .const import Const
from .lin_ard import LinArd
from .lin_one import LinOne
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
}

__all__ = [
    "KernelFamily",
    "sqdist",
    "weighted_eval",
    "Const",
    "LinOne",
    "LinArd",
    "SeIso",
    "SeFat",
    "FAMILIES",
]
