from .image import cfgs, image_models, model_architectures, create_model
from .npz import load_npz_weights, save_npz_weights
from .torch_convert import (
    load_checkpoint_file,
    load_torch_state_dict,
    rename_legacy_keys,
)

models = image_models

__all__ = [
    "models",
    "image_models",
    "model_architectures",
    "cfgs",
    "create_model",
    "load_torch_state_dict",
    "load_checkpoint_file",
    "rename_legacy_keys",
]
