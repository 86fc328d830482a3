from .clip import (
    CLIPConfig,
    CLIPModel,
    clip_vit_b16,
    init_clip_params,
    convert_openai_checkpoint,
)

__all__ = [
    "CLIPConfig",
    "CLIPModel",
    "clip_vit_b16",
    "init_clip_params",
    "convert_openai_checkpoint",
]
