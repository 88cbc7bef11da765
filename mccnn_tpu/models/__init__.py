"""Model zoo: TPU-native equivalents of the reference's network definitions
(models/MCClassS.py, MCClass.py, MCClassH.py, MCNorm.py, MCNormS.py,
MCSeg.py — SURVEY §2.2)."""

from .layers import (
    BatchNormReluDropout,
    Conv1x1,
    FullyConnected,
    MaskedBatchNorm,
    MCConv,
)
from .mcclass import MCClass
from .mcclass_h import MCClassH
from .mcclass_s import MCClassS
from .mcnorm import MCNorm, MCNormS
from .mcseg import MCSeg

__all__ = [
    "BatchNormReluDropout",
    "Conv1x1",
    "FullyConnected",
    "MCClass",
    "MCClassH",
    "MCClassS",
    "MCConv",
    "MCNorm",
    "MCNormS",
    "MCSeg",
    "MaskedBatchNorm",
]
