"""Flax models: U-Net, PostNet, and the model/optimizer registries."""
from rcu_tpu.models.registry import get_model, get_optimizer  # noqa: F401
from rcu_tpu.models.unet import (  # noqa: F401
    FAST_DECODER_KWARGS, ConvBnRelu, PostNet, UNet, UNetOutput,
    f32_head_keys, fold_bn_params, precast_params)
