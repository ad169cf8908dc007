"""Reference-exact corrector transformer (weight-compatible).

The reference's SMILES corrector (``/root/reference/src/util/smiles_cor.py``)
is a post-LN encoder/decoder transformer (Encoder 575-606, EncoderLayer
608-637, MultiHeadAttentionLayer 639-690, PositionwiseFeedforward 692-705,
Decoder 708-753, DecoderLayer 755-795, Seq2Seq 798-882) with *separate*
source/target embeddings, sqrt(hid) embedding scale, and greedy 202-step
decode over reversed-target tokens (``translate_sentence``, 864-882).

Our trainable corrector (:mod:`druggen_tpu.infer.seq2seq`) is a pre-LN
redesign; THIS module reproduces the reference topology exactly so the
released PAPYRUS_200 ``.pkg`` state_dict can be imported
(:mod:`druggen_tpu.interop.corrector_ckpt`) and run TPU-natively.  Pure
jnp functions over a params pytree whose nesting mirrors the torch module
tree — conversion is mechanical.

Inference-only (dropout layers are identity), jitted greedy decode via
``lax.scan`` over a fixed-length target buffer.
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

# torchtext Field default specials order (Field(init/eos specified):
# ['<unk>', '<pad>', '<sos>', '<eos>'] — smiles_cor.py:953-965)
UNK, PAD, SOS, EOS = 0, 1, 2, 3


def _linear(p, x):
    return x @ p["kernel"] + p["bias"]


def _ln(p, x, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _mha(p, q_in, k_in, v_in, mask, heads):
    """Reference MultiHeadAttentionLayer.forward (smiles_cor.py:655-690):
    standard scaled dot-product; mask==0 positions get -1e10."""
    b, ql, d = q_in.shape
    hd = d // heads
    q = _linear(p["fc_q"], q_in).reshape(b, ql, heads, hd).transpose(0, 2, 1, 3)
    k = _linear(p["fc_k"], k_in).reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
    v = _linear(p["fc_v"], v_in).reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
    energy = q @ k.transpose(0, 1, 3, 2) / math.sqrt(hd)
    energy = jnp.where(mask, energy, -1e10)
    attn = jax.nn.softmax(energy, axis=-1)
    x = (attn @ v).transpose(0, 2, 1, 3).reshape(b, ql, d)
    return _linear(p["fc_o"], x)


def _ff(p, x):
    return _linear(p["fc_2"], jax.nn.relu(_linear(p["fc_1"], x)))


def _encoder(p, src, src_mask, heads):
    b, L = src.shape
    d = p["tok_embedding"].shape[1]
    pos = jnp.arange(L)[None, :]
    x = p["tok_embedding"][src] * math.sqrt(d) + p["pos_embedding"][pos]
    for lp in p["layers"]:
        a = _mha(lp["self_attention"], x, x, x, src_mask, heads)
        x = _ln(lp["self_attn_layer_norm"], x + a)
        x = _ln(lp["ff_layer_norm"], x + _ff(lp["positionwise_feedforward"],
                                             x))
    return x


def _decoder(p, trg, enc_src, trg_mask, src_mask, heads):
    b, L = trg.shape
    d = p["tok_embedding"].shape[1]
    pos = jnp.arange(L)[None, :]
    x = p["tok_embedding"][trg] * math.sqrt(d) + p["pos_embedding"][pos]
    for lp in p["layers"]:
        a = _mha(lp["self_attention"], x, x, x, trg_mask, heads)
        x = _ln(lp["self_attn_layer_norm"], x + a)
        a = _mha(lp["encoder_attention"], x, enc_src, enc_src, src_mask,
                 heads)
        x = _ln(lp["enc_attn_layer_norm"], x + a)
        x = _ln(lp["ff_layer_norm"], x + _ff(lp["positionwise_feedforward"],
                                             x))
    return _linear(p["fc_out"], x)


def make_src_mask(src, pad_idx=PAD):
    return (src != pad_idx)[:, None, None, :]


def make_trg_mask(trg, pad_idx=PAD):
    L = trg.shape[1]
    pad_mask = (trg != pad_idx)[:, None, None, :]
    sub = jnp.tril(jnp.ones((L, L), bool))
    return pad_mask & sub[None, None, :, :]


def forward(params, src, trg, *, heads: int = 8,
            src_pad: int = PAD, trg_pad: int = PAD):
    """Reference Seq2Seq.forward (logits over target positions)."""
    src_mask = make_src_mask(src, src_pad)
    enc = _encoder(params["encoder"], src, src_mask, heads)
    return _decoder(params["decoder"], trg, enc,
                    make_trg_mask(trg, trg_pad), src_mask, heads)


@partial(jax.jit, static_argnames=("heads", "max_len"))
def greedy_translate(params, src, *, heads: int = 8, max_len: int = 202):
    """Reference translate_sentence (smiles_cor.py:864-882), compiled:
    fixed-length target buffer, one decoder pass per emitted token."""
    b = src.shape[0]
    src_mask = make_src_mask(src)
    enc = _encoder(params["encoder"], src, src_mask, heads)
    buf = jnp.full((b, max_len + 1), PAD, jnp.int32).at[:, 0].set(SOS)

    def step(buf, t):
        logits = _decoder(params["decoder"], buf, enc,
                          make_trg_mask(buf), src_mask, heads)
        nxt = jnp.argmax(logits[:, :, :], -1)
        tok = jnp.take_along_axis(nxt, (t - 1)[None, None].repeat(b, 0),
                                  axis=1)[:, 0]
        buf = buf.at[:, t].set(tok.astype(jnp.int32))
        return buf, None

    buf, _ = jax.lax.scan(step, buf, jnp.arange(1, max_len + 1))
    return buf[:, 1:]


def init_params(seed: int, src_vocab_size: int, trg_vocab_size: int,
                hid: int = 256, pf: int = 512, n_layers: int = 3,
                max_len: int = 202) -> dict:
    """Random init of the reference-topology params pytree — the same
    nesting ``interop.corrector_ckpt.convert_corrector_state_dict``
    produces, so a from-scratch-trained model and an imported PAPYRUS_200
    checkpoint are interchangeable.  Xavier-uniform linears and N(0,1)
    embeddings match the reference's torch defaults
    (``smiles_cor.py:575-606`` nn.Linear / nn.Embedding)."""
    rng = np.random.default_rng(seed)

    def lin(i, o):
        bound = math.sqrt(6.0 / (i + o))
        return {"kernel": rng.uniform(-bound, bound, (i, o)).astype(np.float32),
                "bias": np.zeros(o, np.float32)}

    def lnp():
        return {"scale": np.ones(hid, np.float32),
                "bias": np.zeros(hid, np.float32)}

    def attn():
        return {"fc_q": lin(hid, hid), "fc_k": lin(hid, hid),
                "fc_v": lin(hid, hid), "fc_o": lin(hid, hid)}

    def block(decoder=False):
        out = {
            "self_attention": attn(),
            "self_attn_layer_norm": lnp(),
            "positionwise_feedforward": {"fc_1": lin(hid, pf),
                                         "fc_2": lin(pf, hid)},
            "ff_layer_norm": lnp(),
        }
        if decoder:
            out["encoder_attention"] = attn()
            out["enc_attn_layer_norm"] = lnp()
        return out

    def emb(v):
        return rng.standard_normal((v, hid)).astype(np.float32)

    pos_rows = max_len + 2          # SOS + tokens + EOS buffer length
    return {
        "encoder": {
            "tok_embedding": emb(src_vocab_size),
            "pos_embedding": emb(pos_rows),
            "layers": [block() for _ in range(n_layers)],
        },
        "decoder": {
            "tok_embedding": emb(trg_vocab_size),
            "pos_embedding": emb(pos_rows),
            "layers": [block(decoder=True) for _ in range(n_layers)],
            "fc_out": lin(hid, trg_vocab_size),
        },
    }


def decode_tokens(ids_row, itos, reverse: bool = True) -> str:
    """Token ids -> SMILES string.  The reference trains the target field
    REVERSED (Field(tokenize=smi_tokenizer(x, reverse=True)),
    smiles_cor.py:959-965), so decoding reverses back."""
    toks = []
    for i in ids_row:
        i = int(i)
        if i == EOS:
            break
        if i in (PAD, SOS, UNK):
            continue
        toks.append(itos[i] if i < len(itos) else "")
    if reverse:
        toks = toks[::-1]
    return "".join(toks)
