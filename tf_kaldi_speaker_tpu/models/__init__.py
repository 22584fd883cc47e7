"""Model zoo: TDNN x-vector network and pooling layers (flax)."""

from .layers import (
    VAR2STD_EPSILON,
    l2_scaling,
    pairwise_cos_similarity,
    pairwise_euc_distances,
)
from .pooling import POOLING_REGISTRY, GhostVLAD, SelfAttentionPooling, StatisticsPooling
from .tdnn import TDNN, TDNN_TOTAL_CONTEXT, EntireNetwork

__all__ = [
    "EntireNetwork",
    "GhostVLAD",
    "POOLING_REGISTRY",
    "SelfAttentionPooling",
    "StatisticsPooling",
    "TDNN",
    "TDNN_TOTAL_CONTEXT",
    "VAR2STD_EPSILON",
    "l2_scaling",
    "pairwise_cos_similarity",
    "pairwise_euc_distances",
]
