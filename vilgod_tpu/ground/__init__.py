from .patchwork import (
    GroundConfig,
    GroundState,
    init_ground_state,
    segment_ground,
    segment_sequence,
    ground_config_from_cfg,
)

__all__ = [
    "GroundConfig",
    "GroundState",
    "init_ground_state",
    "segment_ground",
    "segment_sequence",
    "ground_config_from_cfg",
]
