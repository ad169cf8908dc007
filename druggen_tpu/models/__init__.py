"""Graph-transformer model family (flax.linen).

Re-implements the reference model layer (``src/model/layers.py``,
``src/model/models.py``) as pure-functional flax modules designed for XLA:
static shapes, no Python control flow in the forward pass, bfloat16-capable
compute with float32 parameters.
"""

from druggen_tpu.models.layers import (
    MLP,
    GraphMHA,
    EncoderBlock,
    TransformerEncoder,
    get_activation,
    stack_block_params,
    unstack_block_params,
)
from druggen_tpu.models.models import Generator, Discriminator, SimpleDisc

__all__ = [
    "MLP",
    "GraphMHA",
    "EncoderBlock",
    "TransformerEncoder",
    "Generator",
    "Discriminator",
    "SimpleDisc",
    "get_activation",
    "stack_block_params",
    "unstack_block_params",
]
