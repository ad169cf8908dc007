"""Interop with the reference's torch checkpoint format.

The reference saves/restores ``torch.save(model.state_dict())`` files
(``/root/reference/train.py:250-263``) and inference loads the released
``{submodel}-G.ckpt`` (``/root/reference/inference.py:135-139``).  This
package converts those state_dicts to/from druggen_tpu flax param trees so
the authors' released weights can be loaded directly.
"""

from druggen_tpu.interop.torch_ckpt import (  # noqa: F401
    flax_discriminator_to_torch,
    flax_generator_to_torch,
    flax_simple_disc_to_torch,
    load_torch_state_dict,
    torch_discriminator_to_flax,
    torch_encoder_block_to_flax,
    torch_generator_to_flax,
    torch_mha_to_flax,
    torch_simple_disc_to_flax,
)
