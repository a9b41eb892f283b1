from ev2hands_tpu.model.layers import (
    FeaturePropagation,
    QueryConv,
    SetAbstractionAll,
    SetAbstractionMsg,
    attention_block,
)
from ev2hands_tpu.model.tehnet import ManoRegressor, TEHNet, apply_mano, tehnet_forward

__all__ = [
    "TEHNet",
    "ManoRegressor",
    "apply_mano",
    "tehnet_forward",
    "SetAbstractionMsg",
    "SetAbstractionAll",
    "FeaturePropagation",
    "QueryConv",
    "attention_block",
]
