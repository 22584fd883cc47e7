"""Loss zoo: margin-softmax family, triplet family, GE2E, aux losses."""

from .head import LOSS_NAMES, LossHead
from .margin import (
    amsoftmax_loss,
    arcsoftmax_loss,
    asoftmax_loss,
    asoftmax_phi,
    margin_annealing_lambda,
    softmax_loss,
    sparse_softmax_xent,
)
from .triplet import angular_triplet_loss, e2e_valid_loss, semihard_triplet_loss

__all__ = [
    "LOSS_NAMES",
    "LossHead",
    "amsoftmax_loss",
    "angular_triplet_loss",
    "arcsoftmax_loss",
    "asoftmax_loss",
    "asoftmax_phi",
    "e2e_valid_loss",
    "margin_annealing_lambda",
    "semihard_triplet_loss",
    "softmax_loss",
    "sparse_softmax_xent",
]
