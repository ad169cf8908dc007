"""ChemNet SMILES embedder for literal FCD.

The reference computes FCD through ``fcd_torch``
(``/root/reference/results/evaluate.py:12,36,69-83``): SMILES are one-hot
encoded over a fixed symbol table, run through the pretrained ChemNet
(Preuer et al. 2018, "Fréchet ChemNet Distance") — a stack of 1-D
convolutions and LSTMs — and the penultimate-layer activations are fitted
with a Gaussian on each side of the comparison.

This module implements that capability TPU-natively (JAX; conv via
``lax.conv_general_dilated``, LSTM via ``lax.scan``) with a pluggable
weight-loading hook:

- :meth:`ChemNet.load` reads a weight file.  Supported formats: a ``.npz``
  with the documented naming scheme below, or an ``fcd_torch``-style
  ``.pt`` (a ``torch.load``-able object holding per-layer configs+weights;
  parsed defensively since that format carries its own architecture spec).
- :meth:`ChemNet.random_init` builds the same architecture with random
  weights — used by the unit tests, which cannot ship the released
  weights (no network egress here).

When real released weights are loaded the resulting numbers are literal
FCD; without them, :class:`druggen_tpu.metrics.fcd.SurrogateChemNet`
remains the documented fallback.

``.npz`` naming scheme (layer index ``i`` in forward order)::

    conv{i}_kernel [k, in, out]    conv{i}_bias [out]
    lstm{i}_Wx [in, 4*h]           lstm{i}_Wh [h, 4*h]   lstm{i}_b [4*h]
    dense{i}_kernel [in, out]      dense{i}_bias [out]

with gate order i, f, g, o and a JSON architecture string under the key
``config`` (list of layer dicts, as produced by :func:`default_config`).
"""

from __future__ import annotations

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------- tokens

# fcd_torch one-hot symbol table: two-char halogens/silicon first, then
# single chars, with a final "unknown" bucket.  Sequences are padded to
# PAD_LEN.
CHEMNET_SYMBOLS = (
    "Cl", "Br", "Si",
    "#", "(", ")", "+", "-", "/", "\\", "=", "@", "[", "]",
    "1", "2", "3", "4", "5", "6", "7", "8", "9",
    "B", "C", "F", "H", "I", "N", "O", "P", "S",
    "b", "c", "n", "o", "s", ".", "%",
)
_UNK = len(CHEMNET_SYMBOLS)          # final bucket
VOCAB_SIZE = len(CHEMNET_SYMBOLS) + 1
PAD_LEN = 350

_TWO_CHAR = {s for s in CHEMNET_SYMBOLS if len(s) == 2}
_ONE_CHAR = {s: i for i, s in enumerate(CHEMNET_SYMBOLS) if len(s) == 1}
_TWO_CHAR_IDX = {s: i for i, s in enumerate(CHEMNET_SYMBOLS) if len(s) == 2}


def tokenize(smiles: str) -> list[int]:
    out = []
    i = 0
    while i < len(smiles):
        two = smiles[i:i + 2]
        if two in _TWO_CHAR:
            out.append(_TWO_CHAR_IDX[two])
            i += 2
            continue
        out.append(_ONE_CHAR.get(smiles[i], _UNK))
        i += 1
    return out[:PAD_LEN]


def one_hot_batch(smiles_list) -> np.ndarray:
    """[B, PAD_LEN, VOCAB_SIZE] float32 (zero rows = padding)."""
    arr = np.zeros((len(smiles_list), PAD_LEN, VOCAB_SIZE), np.float32)
    for b, s in enumerate(smiles_list):
        for t, tok in enumerate(tokenize(s)):
            arr[b, t, tok] = 1.0
    return arr


# ---------------------------------------------------------------- layers

def default_config() -> list[dict]:
    """ChemNet-shaped architecture: conv stack -> LSTM stack -> 512-d
    penultimate activations.  Used for random-init testing; when a weight
    file carries its own architecture spec (fcd_torch .pt or the npz
    ``config`` key), that spec wins."""
    return [
        {"type": "conv", "filters": 32, "kernel": 9, "activation": "selu"},
        {"type": "conv", "filters": 64, "kernel": 9, "activation": "selu"},
        {"type": "conv", "filters": 128, "kernel": 10, "activation": "selu"},
        {"type": "lstm", "units": 256, "return_sequences": True},
        {"type": "lstm", "units": 512, "return_sequences": False},
    ]


def _act(name):
    return {"selu": jax.nn.selu, "relu": jax.nn.relu,
            "tanh": jnp.tanh, "linear": lambda x: x}[name]


def _conv1d(x, kernel, bias, activation):
    # x [B, T, C]; kernel [k, in, out]; SAME padding
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"))
    return _act(activation)(y + bias)


def _lstm(x, mask, Wx, Wh, b, return_sequences):
    # x [B, T, C]; mask [B, T] 1.0 at real tokens; gates ordered i, f, g, o.
    # Padded steps leave the carry unchanged (Keras Masking semantics — the
    # final state is the state at the last REAL token; without this, 350-T
    # padding drives the recurrence to an input-independent fixed point).
    B = x.shape[0]
    h_dim = Wh.shape[0]
    xg = x @ Wx + b                      # [B, T, 4h] — one big MXU matmul

    def step(carry, inp):
        xg_t, m_t = inp                  # m_t [B, 1]
        h, c = carry
        gates = xg_t + h @ Wh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        h = m_t * h_new + (1.0 - m_t) * h
        c = m_t * c_new + (1.0 - m_t) * c
        return (h, c), h * m_t

    init = (jnp.zeros((B, h_dim), x.dtype), jnp.zeros((B, h_dim), x.dtype))
    (h_last, _), hs = jax.lax.scan(
        step, init,
        (jnp.swapaxes(xg, 0, 1), jnp.swapaxes(mask, 0, 1)[..., None]))
    return jnp.swapaxes(hs, 0, 1) if return_sequences else h_last


def _dense(x, kernel, bias, activation):
    return _act(activation)(x @ kernel + bias)


# ---------------------------------------------------------------- model

class ChemNet:
    """Config-driven ChemNet embedder.

    ``config``: list of layer dicts (see :func:`default_config`).
    ``params``: list of per-layer tuples of numpy arrays.
    """

    def __init__(self, config: list[dict], params: list[tuple]):
        self.config = config
        self.params = [tuple(np.asarray(w, np.float32) for w in p)
                       for p in params]
        self._jit = jax.jit(self._forward)

    # ------------------------------------------------------- construction
    @classmethod
    def random_init(cls, seed: int = 0, config: list[dict] | None = None,
                    in_dim: int = VOCAB_SIZE) -> "ChemNet":
        config = config or default_config()
        rng = np.random.default_rng(seed)
        params = []
        c = in_dim
        for layer in config:
            if layer["type"] == "conv":
                k, f = layer["kernel"], layer["filters"]
                params.append((rng.standard_normal((k, c, f)) / np.sqrt(k * c),
                               np.zeros(f)))
                c = f
            elif layer["type"] == "lstm":
                h = layer["units"]
                params.append((
                    rng.standard_normal((c, 4 * h)) / np.sqrt(c),
                    rng.standard_normal((h, 4 * h)) / np.sqrt(h),
                    np.zeros(4 * h)))
                c = h
            elif layer["type"] == "dense":
                u = layer["units"]
                params.append((rng.standard_normal((c, u)) / np.sqrt(c),
                               np.zeros(u)))
                c = u
            else:
                raise ValueError(f"unknown layer {layer}")
        return cls(config, params)

    @classmethod
    def load(cls, path: str) -> "ChemNet":
        """Load weights from ``.npz`` (documented scheme) or an
        fcd_torch-style ``.pt``."""
        if path.endswith(".npz"):
            return cls._load_npz(path)
        return cls._load_torch(path)

    @classmethod
    def _load_npz(cls, path: str) -> "ChemNet":
        data = np.load(path, allow_pickle=False)
        config = json.loads(str(data["config"]))
        params = []
        for i, layer in enumerate(config):
            if layer["type"] == "conv":
                params.append((data[f"conv{i}_kernel"], data[f"conv{i}_bias"]))
            elif layer["type"] == "lstm":
                params.append((data[f"lstm{i}_Wx"], data[f"lstm{i}_Wh"],
                               data[f"lstm{i}_b"]))
            elif layer["type"] == "dense":
                params.append((data[f"dense{i}_kernel"],
                               data[f"dense{i}_bias"]))
        return cls(config, params)

    def save_npz(self, path: str) -> None:
        out = {"config": json.dumps(self.config)}
        for i, (layer, p) in enumerate(zip(self.config, self.params)):
            if layer["type"] == "conv":
                out[f"conv{i}_kernel"], out[f"conv{i}_bias"] = p
            elif layer["type"] == "lstm":
                (out[f"lstm{i}_Wx"], out[f"lstm{i}_Wh"],
                 out[f"lstm{i}_b"]) = p
            elif layer["type"] == "dense":
                out[f"dense{i}_kernel"], out[f"dense{i}_bias"] = p
        np.savez(path, **out)

    @classmethod
    def _load_torch(cls, path: str) -> "ChemNet":
        """Parse an fcd_torch-style checkpoint: torch.load yields a
        structure carrying keras-exported layer configs + weights.  Parsed
        defensively (conv kernels may arrive [out,in,k] torch-style or
        [k,in,out] keras-style; LSTM gate order keras i,f,c,o is our
        i,f,g,o)."""
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(obj, dict) and "config" in obj and "params" in obj:
            # our own serialization round-trip
            return cls(obj["config"],
                       [[np.asarray(w) for w in p] for p in obj["params"]])
        config: list[dict] = []
        params: list[tuple] = []
        entries = obj if isinstance(obj, (list, tuple)) else obj.items()
        for entry in entries:
            name, payload = entry if isinstance(entry, tuple) else (
                entry.get("name", ""), entry)
            lname = str(name).lower()
            ws = [np.asarray(w) for w in
                  (payload.get("weights") if isinstance(payload, dict)
                   else payload)]
            if "conv" in lname:
                k = ws[0]
                if k.ndim == 3 and k.shape[0] < k.shape[2]:
                    pass                       # already [k, in, out]
                elif k.ndim == 3:
                    k = np.transpose(k, (2, 1, 0))  # torch [out,in,k]
                config.append({"type": "conv", "filters": k.shape[2],
                               "kernel": k.shape[0], "activation": "selu"})
                params.append((k, ws[1]))
            elif "lstm" in lname:
                Wx, Wh, b = ws[0], ws[1], ws[2]
                if Wx.shape[0] == 4 * Wh.shape[-1]:   # torch [4h, in]
                    Wx, Wh = Wx.T, Wh.T
                config.append({"type": "lstm", "units": Wh.shape[0],
                               "return_sequences": True})
                params.append((Wx, Wh, b))
            elif "dense" in lname:
                kern = ws[0]
                if kern.ndim == 2 and kern.shape[0] < kern.shape[1]:
                    kern = kern.T
                config.append({"type": "dense", "units": kern.shape[1],
                               "activation": "linear"})
                params.append((kern, ws[1]))
        if not config:
            raise ValueError(f"unrecognized ChemNet checkpoint: {path}")
        if config[-1]["type"] == "lstm":
            config[-1]["return_sequences"] = False
        return cls(config, params)

    # ---------------------------------------------------------- forward
    def _forward(self, x, params):
        mask = (x.sum(-1) > 0).astype(x.dtype)   # [B, T]; pads are all-zero
        for layer, p in zip(self.config, params):
            if layer["type"] == "conv":
                x = _conv1d(x, p[0], p[1], layer.get("activation", "selu"))
            elif layer["type"] == "lstm":
                x = _lstm(x, mask, p[0], p[1], p[2],
                          layer.get("return_sequences", False))
            elif layer["type"] == "dense":
                x = _dense(x, p[0], p[1], layer.get("activation", "linear"))
        if x.ndim == 3:                 # last layer returned sequences
            x = x[:, -1, :]
        return x

    def __call__(self, smiles_list, batch_size: int = 128) -> np.ndarray:
        """Embed SMILES -> [N, D] activations (ChemNet featurizer contract
        for :class:`druggen_tpu.metrics.fcd.FCD`)."""
        smiles_list = [s for s in smiles_list if s]
        if not smiles_list:
            dim = (self.config[-1].get("units")
                   or self.config[-1].get("filters"))
            return np.zeros((0, dim), np.float32)
        outs = []
        jparams = [tuple(jnp.asarray(w) for w in p) for p in self.params]
        for i in range(0, len(smiles_list), batch_size):
            chunk = smiles_list[i:i + batch_size]
            # pad the tail chunk to batch_size to keep one compiled shape
            pad = batch_size - len(chunk)
            x = one_hot_batch(chunk + [""] * pad)
            y = np.asarray(self._jit(jnp.asarray(x), jparams))
            outs.append(y[:len(chunk)])
        return np.concatenate(outs, axis=0)


def chemnet_from_env() -> ChemNet | None:
    """Load ChemNet weights from $DRUGGEN_CHEMNET_WEIGHTS if set."""
    path = os.environ.get("DRUGGEN_CHEMNET_WEIGHTS")
    if path and os.path.exists(path):
        return ChemNet.load(path)
    return None
