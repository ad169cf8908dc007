"""Import the reference's released corrector (PAPYRUS_200) artifacts.

Three artifacts ship with the reference (downloaded by ``setup.sh``):

- ``<name>.pkg``          — torch ``state_dict`` of the Seq2Seq
  (saved/loaded at ``smiles_cor.py:1209``),
- ``<name>_vocab_src.pth``/``_vocab_trg.pth`` — ``torch.save``d
  ``torchtext.vocab.Vocab`` objects (``smiles_cor.py:1038-1039``).

torchtext is not installed here, so :func:`install_torchtext_shim`
registers stand-in classes under the ``torchtext.vocab`` module names
before unpickling — the pickle only needs the class to exist and absorb
its ``__dict__`` (freqs/itos/stoi).  The state_dict converts mechanically
into :mod:`druggen_tpu.infer.seq2seq_ref`'s pytree (Linear weights
transpose; embeddings/LayerNorms copy).

Usable today with randomly-initialized reference-shaped checkpoints (the
tests build one); loads the released PAPYRUS_200 verbatim when the file
is present.
"""

from __future__ import annotations

import sys
import types

import numpy as np


# ------------------------------------------------------------- vocab shim

def _default_unk_index():
    return 0


class _ShimVocab:
    """Absorbs a pickled torchtext 0.6 ``Vocab`` (attrs: freqs, itos,
    stoi, vectors)."""

    def __setstate__(self, state):
        self.__dict__.update(state)


def install_torchtext_shim() -> None:
    """Register minimal ``torchtext``/``torchtext.vocab`` modules so
    ``torch.load`` can unpickle saved Vocab objects without torchtext."""
    if "torchtext" in sys.modules and hasattr(sys.modules["torchtext"],
                                              "vocab"):
        return
    tt = types.ModuleType("torchtext")
    vocab_mod = types.ModuleType("torchtext.vocab")
    vocab_mod.Vocab = _ShimVocab
    vocab_mod._default_unk_index = _default_unk_index
    tt.vocab = vocab_mod
    sys.modules["torchtext"] = tt
    sys.modules["torchtext.vocab"] = vocab_mod
    # torchtext 0.6 pickles may also reference torchtext.data.utils
    data_mod = types.ModuleType("torchtext.data")
    utils_mod = types.ModuleType("torchtext.data.utils")
    tt.data = data_mod
    data_mod.utils = utils_mod
    sys.modules["torchtext.data"] = data_mod
    sys.modules["torchtext.data.utils"] = utils_mod


def load_torchtext_vocab(path: str) -> tuple[list[str], dict[str, int]]:
    """Load a ``torch.save``d torchtext Vocab -> (itos, stoi)."""
    import torch

    install_torchtext_shim()
    obj = torch.load(path, map_location="cpu", weights_only=False)
    itos = list(obj.itos)
    stoi = {s: i for i, s in enumerate(itos)}
    # the pickled stoi is a defaultdict(unk); rebuild from itos for
    # determinism, then overlay any extra mappings
    for k, v in dict(getattr(obj, "stoi", {})).items():
        stoi.setdefault(k, v)
    return itos, stoi


# --------------------------------------------------------- weight convert

def _lin(sd, prefix):
    return {"kernel": np.asarray(sd[f"{prefix}.weight"]).T,
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _lnp(sd, prefix):
    return {"scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _attn(sd, prefix):
    return {k: _lin(sd, f"{prefix}.{k}")
            for k in ("fc_q", "fc_k", "fc_v", "fc_o")}


def convert_corrector_state_dict(sd) -> dict:
    """torch state_dict (reference Seq2Seq) -> seq2seq_ref params pytree."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else
              np.asarray(v)) for k, v in sd.items()}
    n_layers = 1 + max(int(k.split(".")[2]) for k in sd
                       if k.startswith("encoder.layers."))

    def block(side, i, decoder=False):
        p = f"{side}.layers.{i}"
        out = {
            "self_attention": _attn(sd, f"{p}.self_attention"),
            "self_attn_layer_norm": _lnp(sd, f"{p}.self_attn_layer_norm"),
            "positionwise_feedforward": {
                "fc_1": _lin(sd, f"{p}.positionwise_feedforward.fc_1"),
                "fc_2": _lin(sd, f"{p}.positionwise_feedforward.fc_2"),
            },
            "ff_layer_norm": _lnp(sd, f"{p}.ff_layer_norm"),
        }
        if decoder:
            out["encoder_attention"] = _attn(sd, f"{p}.encoder_attention")
            out["enc_attn_layer_norm"] = _lnp(sd, f"{p}.enc_attn_layer_norm")
        return out

    return {
        "encoder": {
            "tok_embedding": np.asarray(sd["encoder.tok_embedding.weight"]),
            "pos_embedding": np.asarray(sd["encoder.pos_embedding.weight"]),
            "layers": [block("encoder", i) for i in range(n_layers)],
        },
        "decoder": {
            "tok_embedding": np.asarray(sd["decoder.tok_embedding.weight"]),
            "pos_embedding": np.asarray(sd["decoder.pos_embedding.weight"]),
            "layers": [block("decoder", i, decoder=True)
                       for i in range(n_layers)],
            "fc_out": _lin(sd, "decoder.fc_out"),
        },
    }


# -------------------------------------------------------------- wrapper

class ReferenceCorrector:
    """Run the released reference corrector TPU-natively.

    ``ReferenceCorrector.load(model_pkg, src_vocab_pth, trg_vocab_pth)``
    then ``translate_batch(invalid_smiles) -> corrected_smiles`` (greedy,
    reversed-target decoding, reference smi_tokenizer regex)."""

    def __init__(self, params, src_stoi, trg_itos, heads: int = 8,
                 max_len: int = 202):
        import jax.numpy as jnp

        self.params = params
        self.src_stoi = src_stoi
        self.trg_itos = trg_itos
        self.heads = heads
        self.max_len = max_len
        self._jnp = jnp

    @classmethod
    def load_trained(cls, path: str) -> "ReferenceCorrector":
        """Load a from-scratch-trained reference-topology corrector
        (``scripts/train_corrector.py --arch reference``: params.msgpack +
        vocab.json in one directory)."""
        import json
        import os

        import jax
        import jax.numpy as jnp
        from flax import serialization

        from druggen_tpu.infer.seq2seq_ref import init_params

        with open(os.path.join(path, "vocab.json")) as f:
            meta = json.load(f)
        itos = meta["itos"]
        template = init_params(0, len(itos), len(itos), hid=meta["hid"],
                               n_layers=meta["n_layers"],
                               max_len=meta["max_len"])
        with open(os.path.join(path, "params.msgpack"), "rb") as f:
            params = serialization.from_bytes(template, f.read())
        params = jax.tree_util.tree_map(jnp.asarray, params)
        stoi = {t: i for i, t in enumerate(itos)}
        return cls(params, stoi, itos, max_len=meta["max_len"])

    @classmethod
    def load(cls, model_pkg: str, src_vocab_pth: str, trg_vocab_pth: str,
             **kw) -> "ReferenceCorrector":
        import torch

        sd = torch.load(model_pkg, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        params = convert_corrector_state_dict(sd)
        _, src_stoi = load_torchtext_vocab(src_vocab_pth)
        trg_itos, _ = load_torchtext_vocab(trg_vocab_pth)
        return cls(params, src_stoi, trg_itos, **kw)

    def _encode_src(self, smiles_list):
        from druggen_tpu.infer.seq2seq import tokenize
        from druggen_tpu.infer.seq2seq_ref import EOS, PAD, SOS, UNK

        L = self.max_len + 2
        arr = np.full((len(smiles_list), L), PAD, np.int32)
        for r, smi in enumerate(smiles_list):
            ids = [SOS] + [self.src_stoi.get(t, UNK)
                           for t in tokenize(smi)][:self.max_len] + [EOS]
            arr[r, :len(ids)] = ids
        return arr

    def translate_batch(self, smiles_list) -> list[str]:
        from druggen_tpu.infer.seq2seq_ref import (
            decode_tokens,
            greedy_translate,
        )

        if not smiles_list:
            return []
        src = self._jnp.asarray(self._encode_src(smiles_list))
        out = np.asarray(greedy_translate(self.params, src,
                                          heads=self.heads,
                                          max_len=self.max_len))
        return [decode_tokens(row, self.trg_itos, reverse=True)
                for row in out]
