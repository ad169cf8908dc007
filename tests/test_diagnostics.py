"""Tests for diagnostics utilities (grad flow, dense->sparse, paired
Tanimoto)."""

import numpy as np

import jax
import jax.numpy as jnp

from druggen_tpu.chem.fingerprints import fingerprints_for_smiles
from druggen_tpu.utils.diagnostics import (
    dense_to_sparse_with_attr,
    grad_flow_summary,
    tanimoto_sim_1v2,
)


def test_grad_flow_summary():
    grads = {"params": {"layer1": {"kernel": jnp.ones((3, 3)),
                                   "bias": jnp.zeros(3)},
                        "layer2": {"kernel": jnp.full((2, 2), 2.0)}}}
    rows = grad_flow_summary(grads)
    names = [r[0] for r in rows]
    assert any("layer1" in n for n in names)
    assert not any(n.endswith("bias") for n in names)
    l2 = [r for r in rows if "layer2" in r[0]][0]
    assert l2[1] == 2.0 and l2[2] == 2.0


def test_dense_to_sparse_2d():
    adj = np.array([[0, 1], [2, 0]])
    idx, attr = dense_to_sparse_with_attr(adj)
    assert list(zip(*idx)) == [(0, 1), (1, 0)]
    np.testing.assert_array_equal(attr, [1, 2])


def test_dense_to_sparse_batched_offsets():
    adj = np.zeros((2, 3, 3), dtype=int)
    adj[0, 0, 1] = 5
    adj[1, 2, 0] = 7
    idx, attr = dense_to_sparse_with_attr(adj)
    # batch 1 rows offset by batch_index * N (reference utils.py:199-201)
    np.testing.assert_array_equal(idx[0], [0, 3 + 2])
    np.testing.assert_array_equal(idx[1], [1, 3 + 0])
    np.testing.assert_array_equal(attr, [5, 7])


def test_tanimoto_1v2():
    fps = fingerprints_for_smiles(["CCO", "CCC", "CCN"])
    assert tanimoto_sim_1v2(fps, fps) == 1.0
    other = fingerprints_for_smiles(["c1ccccc1", "C1CCCCC1", "CC(=O)O"])
    v = tanimoto_sim_1v2(fps, other)
    assert 0.0 <= v < 1.0
    assert tanimoto_sim_1v2(fps[:0], other) == 0.0
