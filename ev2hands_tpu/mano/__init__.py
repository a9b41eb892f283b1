from ev2hands_tpu.mano.layer import (
    ManoHand,
    ManoOutput,
    ManoParams,
    create_mano_hands,
    create_mano_params,
    mano_forward,
    quat_to_rotmat,
    rodrigues,
)
from ev2hands_tpu.mano.model_data import (
    JOINT_REORDER,
    KINTREE_PARENTS,
    ManoModelData,
    load_mano_models,
    load_mano_pkl,
    synthetic_mano_models,
)

__all__ = [
    "ManoHand",
    "ManoOutput",
    "ManoParams",
    "ManoModelData",
    "create_mano_hands",
    "create_mano_params",
    "mano_forward",
    "rodrigues",
    "quat_to_rotmat",
    "load_mano_models",
    "load_mano_pkl",
    "synthetic_mano_models",
    "KINTREE_PARENTS",
    "JOINT_REORDER",
]
