"""Checkpointing.

The reference saves ``{epoch}-{iter}-G.ckpt`` / ``-D.ckpt`` torch
state_dicts every log step (``train.py:259-263``) and restores by explicit
epoch/iter flags (``train.py:250-257``).  We keep the same naming capability
for G/D param exports, and add what the reference lacks (SURVEY.md §5
failure-detection row): a full-train-state checkpoint (params + optimizer
states + step) with atomic writes and auto-latest resume.

Format: flax msgpack serialization (pure pytree bytes, no pickle).
"""

from __future__ import annotations

import os
import re

import jax
import jax.numpy as jnp
from flax import serialization

from druggen_tpu.train.step import GANState

_STATE_RE = re.compile(r"^state_(\d+)\.msgpack$")


def _atomic_write(path: str, data: bytes) -> None:
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def save_params(path: str, params) -> None:
    """Export a bare param pytree (e.g. '{submodel}-G.ckpt' for inference,
    reference inference.py:135-139)."""
    _atomic_write(path, serialization.to_bytes(
        jax.device_get(params)))


def load_params(path: str, template):
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def _has_stacked_blocks(tree) -> bool:
    """True if a ``{'blocks': {'block': …}}`` subtree (the scan_layers
    param layout, models/layers.py:317) appears anywhere in the tree."""
    if not isinstance(tree, dict):
        return False
    if set(tree) == {"blocks"} and isinstance(tree["blocks"], dict) \
            and set(tree["blocks"]) == {"block"}:
        return True
    return any(_has_stacked_blocks(v) for v in tree.values())


def load_params_auto(path: str, template):
    """Like :func:`load_params`, but detects a scan_layers/unrolled layout
    mismatch between the checkpoint and ``template`` and converts the
    loaded tree with stack/unstack_block_params.  Lets checkpoints trained
    with ``--scan_layers`` load into an unrolled inference Generator (and
    vice versa) without manual conversion."""
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    tstate = serialization.to_state_dict(template)
    raw_stacked = _has_stacked_blocks(raw)
    tmpl_stacked = _has_stacked_blocks(tstate)
    if raw_stacked and not tmpl_stacked:
        from druggen_tpu.models.layers import unstack_block_params
        raw = unstack_block_params(raw)
    elif tmpl_stacked and not raw_stacked:
        from druggen_tpu.models.layers import stack_block_params
        raw = stack_block_params(raw)
    return serialization.from_state_dict(template, raw)


def save_gd_params(model_dir: str, state: GANState, epoch: int, it: int) -> None:
    """Reference-style G/D exports (train.py:259-263 naming)."""
    os.makedirs(model_dir, exist_ok=True)
    save_params(os.path.join(model_dir, f"{epoch}-{it}-G.ckpt"), state.g_params)
    save_params(os.path.join(model_dir, f"{epoch}-{it}-D.ckpt"), state.d_params)


def save_state(model_dir: str, state: GANState, keep: int = 3) -> str:
    """Full-state checkpoint named by global step; prunes to ``keep``."""
    os.makedirs(model_dir, exist_ok=True)
    step = int(jax.device_get(state.step))
    path = os.path.join(model_dir, f"state_{step}.msgpack")
    _atomic_write(path, serialization.to_bytes(jax.device_get(state)))
    _prune(model_dir, keep)
    return path


def latest_state_path(model_dir: str) -> str | None:
    if not os.path.isdir(model_dir):
        return None
    best, best_step = None, -1
    for name in os.listdir(model_dir):
        m = _STATE_RE.match(name)
        if m and int(m.group(1)) > best_step:
            best_step = int(m.group(1))
            best = os.path.join(model_dir, name)
    return best


_GUARD_FIELDS = {"notfinite_count", "total_notfinite", "inner_state"}


def _migrate_guard_structure(raw: dict, tstate: dict) -> dict:
    """Bridge the ``apply_if_all_finite`` wrapper across checkpoint eras.

    The default-on non-finite guard (round 4) wraps each optimizer state in
    an :class:`druggen_tpu.train.step.AllFiniteState`, changing the state
    pytree: pre-round-4 full-state checkpoints no longer restore with
    default flags, and guarded checkpoints fail under
    ``--no_nonfinite_guard``.  Both mismatches are mechanical — wrap the
    old inner state with zeroed counters, or unwrap ``inner_state`` —
    so do that instead of surfacing an opaque structure error."""
    out = dict(raw)
    for key in ("g_opt_state", "d_opt_state"):
        t, r = tstate.get(key), raw.get(key)
        if not isinstance(t, dict) or not isinstance(r, dict):
            continue
        t_guarded = set(t) == _GUARD_FIELDS
        r_guarded = set(r) == _GUARD_FIELDS
        if t_guarded and not r_guarded:
            import numpy as np

            zero = np.zeros((), np.int32)
            out[key] = {"notfinite_count": zero, "total_notfinite": zero,
                        "inner_state": r}
        elif r_guarded and not t_guarded:
            out[key] = r["inner_state"]
    return out


def restore_state(model_dir: str, template: GANState,
                  path: str | None = None) -> GANState | None:
    """Restore the newest (or an explicit) full-state checkpoint.

    Detects the guarded/unguarded optimizer-state layout mismatch (the
    ``nonfinite_guard`` flag changed between save and restore) and migrates
    the tree; any other structure mismatch raises with a message naming the
    checkpoint instead of flax's opaque key error."""
    path = path or latest_state_path(model_dir)
    if path is None or not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    tstate = serialization.to_state_dict(template)
    try:
        restored = serialization.from_state_dict(
            template, _migrate_guard_structure(raw, tstate))
    except (KeyError, ValueError) as e:
        raise ValueError(
            f"checkpoint {path} does not match the current training state "
            f"structure (model size/depth, optimizer, or guard flags "
            f"changed since it was saved): {e}") from e
    # serialization returns the same pytree type as template
    return GANState(*restored) if not isinstance(restored, GANState) else restored


def restore_gd_params(model_dir: str, state: GANState, epoch: int,
                      it: int) -> GANState:
    """Reference-style resume from '{epoch}-{iter}-{G,D}.ckpt'
    (train.py:250-257); optimizer states are freshly initialized, like the
    reference (which never saves them)."""
    g = load_params(os.path.join(model_dir, f"{epoch}-{it}-G.ckpt"),
                    state.g_params)
    d = load_params(os.path.join(model_dir, f"{epoch}-{it}-D.ckpt"),
                    state.d_params)
    return state._replace(g_params=g, d_params=d)


def _prune(model_dir: str, keep: int) -> None:
    entries = []
    for name in os.listdir(model_dir):
        m = _STATE_RE.match(name)
        if m:
            entries.append((int(m.group(1)), name))
    entries.sort()
    for _, name in entries[:-keep] if keep > 0 else []:
        try:
            os.remove(os.path.join(model_dir, name))
        except OSError:
            pass
