"""Training diagnostics.

Small parity utilities completing the reference inventory:

- :func:`grad_flow_summary` / :func:`plot_grad_flow` — per-layer gradient
  magnitudes for vanishing/exploding-gradient checks (reference
  ``plot_grad_flow``, ``src/util/utils.py:358-396``).
- :func:`dense_to_sparse_with_attr` — dense adjacency -> (indices, attrs)
  (reference ``utils.py:183-202``).
- :func:`tanimoto_sim_1v2` — mean pairwise Tanimoto over aligned
  fingerprint pairs (reference ``Metrics.tanimoto_sim_1v2``,
  ``utils.py:56-75``).
"""

from __future__ import annotations

import numpy as np

import jax


def grad_flow_summary(grads) -> list[tuple[str, float, float]]:
    """[(layer_name, mean_abs, max_abs)] per non-bias parameter leaf."""
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(grads)[0]:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if name.endswith("bias"):
            continue
        arr = np.abs(np.asarray(leaf))
        out.append((name, float(arr.mean()), float(arr.max())))
    return out


def plot_grad_flow(grads, model_name: str, step: int, out_dir: str) -> str:
    """Bar plot of per-layer mean/max gradient magnitudes (reference
    plot_grad_flow, utils.py:358-396)."""
    import os

    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    rows = grad_flow_summary(grads)
    names = [r[0] for r in rows]
    means = [r[1] for r in rows]
    maxes = [r[2] for r in rows]
    fig, ax = plt.subplots(figsize=(max(6, len(rows) * 0.4), 4))
    xs = np.arange(len(rows))
    ax.bar(xs, maxes, alpha=0.3, color="c", label="max-gradient")
    ax.bar(xs, means, alpha=0.6, color="b", label="mean-gradient")
    ax.set_xticks(xs)
    ax.set_xticklabels(names, rotation="vertical", fontsize=6)
    ax.set_ylabel("|grad|")
    ax.set_title(f"Gradient flow: {model_name} @ step {step}")
    ax.legend()
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"gradflow_{model_name}_{step}.png")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def dense_to_sparse_with_attr(adj: np.ndarray):
    """Dense adjacency ([N,N] or [B,N,N]) -> (indices, edge_attr), with the
    reference's batch-offset flattening for 3-D input (utils.py:183-202)."""
    adj = np.asarray(adj)
    assert adj.ndim in (2, 3)
    assert adj.shape[-1] == adj.shape[-2]
    index = np.nonzero(adj)
    edge_attr = adj[index]
    if len(index) == 3:
        batch = index[0] * adj.shape[-1]
        index = (batch + index[1], batch + index[2])
    return index, edge_attr


def tanimoto_sim_1v2(fps1: np.ndarray, fps2: np.ndarray) -> float:
    """Mean Tanimoto over aligned pairs (truncates to the shorter set)."""
    n = min(len(fps1), len(fps2))
    if n == 0:
        return 0.0
    sims = []
    for a, b in zip(fps1[:n], fps2[:n]):
        inter = float(np.sum(np.logical_and(a, b)))
        union = float(np.sum(np.logical_or(a, b)))
        sims.append(inter / union if union else 1.0)
    return float(np.mean(sims))
