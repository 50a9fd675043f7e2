"""
Model family: StyleGAN2 (config-f class) generator + discriminator in functional JAX,
plus the TF1 .pkl weight loader that replaces the reference's `dnnlib.tflib.Network`
unpickling (network_functions.py:93-111).
"""

from gance_tpu.models.stylegan2 import (
    GeneratorConfig,
    generator_apply,
    images_to_uint8,
    init_discriminator_params,
    init_generator_params,
    mapping_apply,
    synthesis_apply,
    truncate_dlatents,
)

__all__ = [
    "GeneratorConfig",
    "generator_apply",
    "images_to_uint8",
    "init_generator_params",
    "init_discriminator_params",
    "mapping_apply",
    "synthesis_apply",
    "truncate_dlatents",
]
