from gifgan_tpu.core.config import (
    DCGANConfig,
    VidGANConfig,
    RecurrentImageConfig,
    TrainConfig,
    InvertConfig,
    TrackConfig,
    load_config,
    save_config,
)
from gifgan_tpu.core.mesh import make_mesh, data_sharding, replicated_sharding
from gifgan_tpu.core.rng import PRNGSequence

__all__ = [
    "DCGANConfig",
    "VidGANConfig",
    "RecurrentImageConfig",
    "TrainConfig",
    "InvertConfig",
    "TrackConfig",
    "load_config",
    "save_config",
    "make_mesh",
    "data_sharding",
    "replicated_sharding",
    "PRNGSequence",
]
