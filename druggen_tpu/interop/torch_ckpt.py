"""torch state_dict <-> flax param-tree converters.

The reference checkpoints are plain ``torch.save(model.state_dict())``
files (``/root/reference/train.py:259-263``; inference restore at
``inference.py:135-139``).  These converters map them, key by key, onto the
druggen_tpu flax module trees (and back), so that

- the authors' released ``{submodel}-G.ckpt`` weights load directly into
  :class:`druggen_tpu.models.Generator`,
- activation-parity tests can run our modules against the *actual*
  reference torch modules with shared weights (tests/test_torch_interop.py),
- checkpoints trained here can be exported for the reference code.

Layout correspondence (reference module -> our flax module):

====================================  =================================
torch key                              flax path
====================================  =================================
``node_layers.0 / .2``                 ``trunk/node_fc1 / node_fc2``
``edge_layers.0 / .2``                 ``trunk/edge_fc1 / edge_fc2``
``TransformerEncoder.Encoder_Blocks.i.lnK``      ``trunk/encoder/block_i/lnK``
``...Encoder_Blocks.i.attn.{q,k,v,e,out_e,out_n}``  ``.../attn/{...}``
``...Encoder_Blocks.i.{mlp,mlp2}.fc{1,2}``          ``.../{mlp,mlp2}/fc{1,2}``
``readout_n / readout_e`` (Generator)  ``readout_n / readout_e``
``node_mlp.{0,2,4,6}`` (Discriminator) ``mlp_fc{1,2,3,4}``
``predictor.{0,2,4,6,8,10}`` (simple_disc)  ``fc{1..6}``
====================================  =================================

Value transforms: ``nn.Linear.weight`` is ``[out, in]`` and flax
``Dense.kernel`` is ``[in, out]`` -> transpose; ``nn.LayerNorm.weight`` maps
to flax ``LayerNorm.scale``.  A leading ``module.`` prefix (checkpoints
saved from an ``nn.DataParallel`` wrapper, reference train.py:220-223) is
stripped.

torch is imported lazily and only for reading/writing ``.ckpt`` files; the
conversion itself is pure numpy.
"""

from __future__ import annotations

import re

import numpy as np

_BLOCK_RE = re.compile(r"^TransformerEncoder\.Encoder_Blocks\.(\d+)\.")


# ---------------------------------------------------------------------------
# torch -> flax
# ---------------------------------------------------------------------------

def _np(t):
    """torch tensor or array-like -> float32-preserving numpy array."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


class _Consumer:
    """Tracks which state_dict keys were consumed so converters can fail
    loudly on unknown/missing keys instead of silently dropping weights."""

    def __init__(self, sd: dict):
        self.sd = dict(sd)
        self.used: set[str] = set()

    def take(self, key: str):
        if key not in self.sd:
            raise KeyError(f"state_dict is missing expected key {key!r}")
        self.used.add(key)
        return _np(self.sd[key])

    def assert_exhausted(self):
        left = set(self.sd) - self.used
        if left:
            raise ValueError(
                f"unconverted state_dict keys (wrong model kind?): "
                f"{sorted(left)[:8]}{'...' if len(left) > 8 else ''}")


def strip_data_parallel_prefix(sd: dict) -> dict:
    """Remove the ``module.`` prefix nn.DataParallel adds on save."""
    if sd and all(k.startswith("module.") for k in sd):
        return {k[len("module."):]: v for k, v in sd.items()}
    return sd


def _linear(c: _Consumer, prefix: str) -> dict:
    return {"kernel": _np(c.take(prefix + ".weight")).T.copy(),
            "bias": _np(c.take(prefix + ".bias"))}


def _ln(c: _Consumer, prefix: str) -> dict:
    return {"scale": _np(c.take(prefix + ".weight")),
            "bias": _np(c.take(prefix + ".bias"))}


def _mha(c: _Consumer, prefix: str) -> dict:
    return {name: _linear(c, prefix + name)
            for name in ("q", "k", "v", "e", "out_e", "out_n")}


def _mlp(c: _Consumer, prefix: str) -> dict:
    return {"fc1": _linear(c, prefix + ".fc1"),
            "fc2": _linear(c, prefix + ".fc2")}


def _block(c: _Consumer, prefix: str) -> dict:
    out = {f"ln{i}": _ln(c, f"{prefix}.ln{i}") for i in (1, 3, 4, 5, 6)}
    out["attn"] = _mha(c, prefix + ".attn.")
    out["mlp"] = _mlp(c, prefix + ".mlp")
    out["mlp2"] = _mlp(c, prefix + ".mlp2")
    return out


def _infer_depth(sd: dict) -> int:
    idx = {int(m.group(1)) for k in sd if (m := _BLOCK_RE.match(k))}
    if not idx:
        raise ValueError("no Encoder_Blocks keys found in state_dict")
    return max(idx) + 1


def _encoder(c: _Consumer, depth: int) -> dict:
    return {f"block_{i}": _block(c, f"TransformerEncoder.Encoder_Blocks.{i}")
            for i in range(depth)}


def _trunk(c: _Consumer, depth: int) -> dict:
    return {
        "node_fc1": _linear(c, "node_layers.0"),
        "node_fc2": _linear(c, "node_layers.2"),
        "edge_fc1": _linear(c, "edge_layers.0"),
        "edge_fc2": _linear(c, "edge_layers.2"),
        "encoder": _encoder(c, depth),
    }


def torch_mha_to_flax(sd: dict) -> dict:
    """Bare reference ``MHA`` state_dict -> ``GraphMHA`` variables."""
    c = _Consumer(strip_data_parallel_prefix(sd))
    params = _mha(c, "")
    c.assert_exhausted()
    return {"params": params}


def torch_encoder_block_to_flax(sd: dict) -> dict:
    """Bare reference ``Encoder_Block`` state_dict -> ``EncoderBlock``
    variables."""
    sd = strip_data_parallel_prefix(sd)
    c = _Consumer(sd)
    out = {f"ln{i}": _ln(c, f"ln{i}") for i in (1, 3, 4, 5, 6)}
    out["attn"] = _mha(c, "attn.")
    out["mlp"] = _mlp(c, "mlp")
    out["mlp2"] = _mlp(c, "mlp2")
    c.assert_exhausted()
    return {"params": out}


def torch_generator_to_flax(sd: dict, scan_layers: bool = False) -> dict:
    """Reference ``Generator.state_dict()`` -> druggen_tpu Generator
    variables (``{'params': ...}``, loadable by ``Generator.apply``).

    ``scan_layers=True`` emits the stacked ``blocks/block`` layout used by
    the ``lax.scan`` encoder."""
    sd = strip_data_parallel_prefix(sd)
    depth = _infer_depth(sd)
    c = _Consumer(sd)
    params = {
        "trunk": _trunk(c, depth),
        "readout_n": _linear(c, "readout_n"),
        "readout_e": _linear(c, "readout_e"),
    }
    c.assert_exhausted()
    if scan_layers:
        from druggen_tpu.models.layers import stack_block_params
        params = stack_block_params(params)
    return {"params": params}


def torch_discriminator_to_flax(sd: dict, scan_layers: bool = False) -> dict:
    """Reference ``Discriminator.state_dict()`` -> druggen_tpu
    Discriminator variables."""
    sd = strip_data_parallel_prefix(sd)
    depth = _infer_depth(sd)
    c = _Consumer(sd)
    params = {"trunk": _trunk(c, depth)}
    for i, tidx in enumerate((0, 2, 4, 6), start=1):
        params[f"mlp_fc{i}"] = _linear(c, f"node_mlp.{tidx}")
    c.assert_exhausted()
    if scan_layers:
        from druggen_tpu.models.layers import stack_block_params
        params = stack_block_params(params)
    return {"params": params}


def torch_simple_disc_to_flax(sd: dict) -> dict:
    """Reference ``simple_disc.state_dict()`` -> druggen_tpu SimpleDisc
    variables."""
    sd = strip_data_parallel_prefix(sd)
    c = _Consumer(sd)
    params = {f"fc{i}": _linear(c, f"predictor.{tidx}")
              for i, tidx in enumerate((0, 2, 4, 6, 8, 10), start=1)}
    c.assert_exhausted()
    return {"params": params}


# ---------------------------------------------------------------------------
# flax -> torch
# ---------------------------------------------------------------------------

def _unwrap(variables: dict) -> dict:
    return variables["params"] if "params" in variables else variables


def _emit_linear(out: dict, torch_prefix: str, p: dict) -> None:
    out[torch_prefix + ".weight"] = np.asarray(p["kernel"]).T.copy()
    out[torch_prefix + ".bias"] = np.asarray(p["bias"])


def _emit_ln(out: dict, torch_prefix: str, p: dict) -> None:
    out[torch_prefix + ".weight"] = np.asarray(p["scale"])
    out[torch_prefix + ".bias"] = np.asarray(p["bias"])


def _emit_block(out: dict, prefix: str, blk: dict) -> None:
    for i in (1, 3, 4, 5, 6):
        _emit_ln(out, f"{prefix}.ln{i}", blk[f"ln{i}"])
    for name in ("q", "k", "v", "e", "out_e", "out_n"):
        _emit_linear(out, f"{prefix}.attn.{name}", blk["attn"][name])
    for m in ("mlp", "mlp2"):
        _emit_linear(out, f"{prefix}.{m}.fc1", blk[m]["fc1"])
        _emit_linear(out, f"{prefix}.{m}.fc2", blk[m]["fc2"])


def _emit_trunk(out: dict, trunk: dict) -> None:
    _emit_linear(out, "node_layers.0", trunk["node_fc1"])
    _emit_linear(out, "node_layers.2", trunk["node_fc2"])
    _emit_linear(out, "edge_layers.0", trunk["edge_fc1"])
    _emit_linear(out, "edge_layers.2", trunk["edge_fc2"])
    enc = trunk["encoder"]
    if set(enc) == {"blocks"}:  # scan layout -> unstack first
        from druggen_tpu.models.layers import unstack_block_params
        enc = unstack_block_params({"encoder": enc})["encoder"]
    for name, blk in enc.items():
        i = int(name.split("_")[1])
        _emit_block(out, f"TransformerEncoder.Encoder_Blocks.{i}", blk)


def flax_generator_to_torch(variables: dict) -> dict:
    """druggen_tpu Generator variables -> reference-layout state_dict
    (numpy values; wrap in torch tensors with ``to_torch_tensors``)."""
    p = _unwrap(variables)
    out: dict = {}
    _emit_trunk(out, p["trunk"])
    _emit_linear(out, "readout_n", p["readout_n"])
    _emit_linear(out, "readout_e", p["readout_e"])
    return out


def flax_discriminator_to_torch(variables: dict) -> dict:
    p = _unwrap(variables)
    out: dict = {}
    _emit_trunk(out, p["trunk"])
    for i, tidx in enumerate((0, 2, 4, 6), start=1):
        _emit_linear(out, f"node_mlp.{tidx}", p[f"mlp_fc{i}"])
    return out


def flax_simple_disc_to_torch(variables: dict) -> dict:
    p = _unwrap(variables)
    out: dict = {}
    for i, tidx in enumerate((0, 2, 4, 6, 8, 10), start=1):
        _emit_linear(out, f"predictor.{tidx}", p[f"fc{i}"])
    return out


def to_torch_tensors(sd: dict) -> dict:
    """numpy-valued state_dict -> torch-tensor-valued (for load_state_dict/
    torch.save)."""
    import torch

    return {k: torch.from_numpy(np.array(v, copy=True)) for k, v in sd.items()}


# ---------------------------------------------------------------------------
# file IO
# ---------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> dict:
    """Read a reference ``.ckpt`` file (a pickled state_dict).

    Handles both a bare state_dict and a dict wrapping one under common
    keys (``state_dict`` / ``model``)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and not any(
            hasattr(v, "detach") for v in obj.values()):
        for key in ("state_dict", "model", "generator", "G"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    return strip_data_parallel_prefix(obj)
