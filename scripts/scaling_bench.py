#!/usr/bin/env python
"""Scaling-efficiency harness (BASELINE config 5 measurement).

Measures full-train-step edges/s on meshes of 1..n_devices devices with the
per-device batch held constant (weak scaling), and reports efficiency
relative to linear scaling.  On a multi-chip TPU slice this is the
>=80%-efficiency check; on a single chip or the virtual CPU mesh it
exercises the harness itself.

Usage:
    python scripts/scaling_bench.py                    # all visible devices
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
        python scripts/scaling_bench.py --per-device-batch 16
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--per-device-batch", type=int, default=128)
    p.add_argument("--vertexes", type=int, default=45)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--depth", type=int, default=1)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--platform", default=None)
    p.add_argument("--mode", choices=["dp", "edge", "tp"], default="dp",
                   help="dp: data-parallel weak scaling; edge: the full "
                   "edge-partitioned WGAN-GP step on ('data','node') "
                   "meshes of growing node width (vertexes padded to a "
                   "multiple of the node axis); tp: the full step with "
                   "GSPMD tensor-parallel param shardings on ('data',"
                   "'model') meshes of growing model width")
    p.add_argument("--compute-dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="activation dtype for the train step (bfloat16 "
                   "matches the headline bench.py configuration)")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    compute_dtype = (jnp.bfloat16 if args.compute_dtype == "bfloat16"
                     else jnp.float32)

    from druggen_tpu.chem.vocab import CHEMBL_VOCAB
    from druggen_tpu.config import TrainConfig
    from druggen_tpu.models import Discriminator, Generator
    from druggen_tpu.parallel import make_mesh, shard_batch, shard_state
    from druggen_tpu.train.step import (
        init_state,
        make_optimizers,
        make_train_step,
    )

    n_devices = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_devices]
    vocab = CHEMBL_VOCAB
    m_dim, b_dim = vocab.m_dim, vocab.b_dim
    vert = args.vertexes

    if args.mode == "edge":
        return edge_mode(args, m_dim, b_dim, compute_dtype)
    if args.mode == "tp":
        return tp_mode(args, m_dim, b_dim, compute_dtype)

    results = []
    base_throughput = None
    for nd in sizes:
        batch = args.per_device_batch * nd
        cfg = TrainConfig(raw_file="x", drug_raw_file="y", batch_size=batch,
                          max_atom=vert, dim=args.dim, heads=args.heads,
                          mlp_ratio=3)
        g = Generator(act="relu", vertexes=vert, edges=b_dim, nodes=m_dim,
                      dropout=0.0, dim=args.dim, depth=args.depth,
                      heads=args.heads, mlp_ratio=3)
        d = Discriminator(act="relu", vertexes=vert, edges=b_dim,
                          nodes=m_dim, dropout=0.0, dim=args.dim,
                          depth=args.depth, heads=args.heads, mlp_ratio=3)
        g_opt, d_opt = make_optimizers(cfg)
        mesh = make_mesh(nd)
        state = shard_state(mesh, init_state(
            g, d, g_opt, d_opt, jax.random.PRNGKey(0), vert, m_dim, b_dim))
        step = make_train_step(g, d, g_opt, d_opt, lambda_gp=10.0,
                               m_dim=m_dim, b_dim=b_dim,
                               compute_dtype=compute_dtype)
        rng = np.random.default_rng(0)
        x = rng.integers(0, m_dim, (batch, vert)).astype(np.int8)
        a0 = np.triu(rng.integers(0, b_dim, (batch, vert, vert)), 1)
        a = (a0 + a0.transpose(0, 2, 1)).astype(np.int8)
        xb, ab, dxb, dab = shard_batch(mesh, x, a, x.copy(), a.copy())
        key = jax.random.PRNGKey(1)
        metrics = None
        for _ in range(3):
            state, metrics, _ = step(state, key, xb, ab, dxb, dab)
        float(metrics["d_loss"])  # hard sync (see bench.py methodology note)

        def chain(k, st):
            t0 = time.perf_counter()
            last = None
            for _ in range(k):
                st, last, _ = step(st, key, xb, ab, dxb, dab)
            float(last["d_loss"])
            return time.perf_counter() - t0, st

        w_small, state = chain(3, state)
        w_large, state = chain(3 + args.iters, state)
        sec = max((w_large - w_small) / args.iters, 1e-9)
        mols = batch / sec
        edges = mols * vert * vert
        if base_throughput is None:
            base_throughput = mols
        eff = mols / (base_throughput * nd)
        results.append({"devices": nd, "batch": batch,
                        "step_seconds": round(sec, 5),
                        "mols_per_s": round(mols, 1),
                        "edges_per_s": round(edges, 1),
                        "scaling_efficiency": round(eff, 3)})
        print(json.dumps(results[-1]))
    print(json.dumps({"summary": results}))


def edge_mode(args, m_dim, b_dim, compute_dtype):
    """Edge-partitioned full-step scaling: hold the GLOBAL batch constant
    and widen the 'node' axis (strong scaling of the edge stream) on
    ('data','node') meshes — the giant-batch capability measurement."""
    import time

    import jax
    import numpy as np

    from druggen_tpu.models import Discriminator, Generator
    from druggen_tpu.parallel import shard_state
    from druggen_tpu.parallel.edge_partition import (
        make_edge_mesh,
        make_sharded_train_step,
        shard_train_inputs,
    )
    from druggen_tpu.train.step import init_state, make_optimizers

    n_devices = len(jax.devices())
    configs = [(1, n) for n in (1, 2, 4, 8) if n <= n_devices]
    # also a mixed mesh when enough devices
    if n_devices >= 8:
        configs.append((2, 4))

    batch = args.per_device_batch

    class _Cfg:
        g_lr = d_lr = 1e-5
        beta1, beta2 = 0.9, 0.999
        adam_weight_decay = 0.01

    results = []
    base = None
    for dp, nk in configs:
        vert = -(-args.vertexes // nk) * nk
        g = Generator(act="relu", vertexes=vert, edges=b_dim, nodes=m_dim,
                      dropout=0.0, dim=args.dim, depth=args.depth,
                      heads=args.heads, mlp_ratio=3)
        d = Discriminator(act="relu", vertexes=vert, edges=b_dim,
                          nodes=m_dim, dropout=0.0, dim=args.dim,
                          depth=args.depth, heads=args.heads, mlp_ratio=3)
        g_opt, d_opt = make_optimizers(_Cfg())
        mesh = make_edge_mesh(dp, nk)
        state = shard_state(mesh, init_state(
            g, d, g_opt, d_opt, jax.random.PRNGKey(0), vert, m_dim, b_dim))
        step = make_sharded_train_step(g, d, g_opt, d_opt, mesh,
                                       lambda_gp=10.0, m_dim=m_dim,
                                       b_dim=b_dim, donate=False,
                                       compute_dtype=compute_dtype)
        rng = np.random.default_rng(0)
        x = rng.integers(0, m_dim, (batch, vert)).astype(np.int8)
        a0 = np.triu(rng.integers(0, b_dim, (batch, vert, vert)), 1)
        a = (a0 + a0.transpose(0, 2, 1)).astype(np.int8)
        xb, ab, dxb, dab = shard_train_inputs(mesh, x, a, x.copy(), a.copy())
        key = jax.random.PRNGKey(1)
        metrics = None
        for _ in range(2):
            state, metrics, _ = step(state, key, xb, ab, dxb, dab)
        float(metrics["d_loss"])

        def chain(k, st):
            t0 = time.perf_counter()
            last = None
            for _ in range(k):
                st, last, _ = step(st, key, xb, ab, dxb, dab)
            float(last["d_loss"])
            return time.perf_counter() - t0, st

        w_small, state = chain(2, state)
        w_large, state = chain(2 + args.iters, state)
        sec = max((w_large - w_small) / args.iters, 1e-9)
        mols = batch / sec
        edges = mols * vert * vert
        if base is None:
            base = mols
        results.append({"mesh": f"{dp}x{nk}", "devices": dp * nk,
                        "batch": batch, "vertexes": vert,
                        "step_seconds": round(sec, 5),
                        "mols_per_s": round(mols, 1),
                        "edges_per_s": round(edges, 1),
                        "speedup_vs_1dev": round(mols / base, 3)})
        print(json.dumps(results[-1]))
    print(json.dumps({"summary": results}))


def tp_mode(args, m_dim, b_dim, compute_dtype):
    """Tensor-parallel full-step scaling: hold the global batch constant
    and widen the 'model' axis on ('data','model') meshes — the same
    GSPMD param shardings the trainer's --mesh_model path installs.  At
    tp=1 the collectives are degenerate, so this doubles as the
    single-chip overhead measurement of the TP program vs the plain
    step (VERDICT r2 item 6)."""
    import time

    import jax
    import numpy as np

    from druggen_tpu.models import Discriminator, Generator
    from druggen_tpu.parallel import shard_batch
    from druggen_tpu.parallel.tensor_parallel import (
        make_dp_tp_mesh,
        shard_gan_state_tp,
    )
    from druggen_tpu.train.step import (
        init_state,
        make_optimizers,
        make_train_step,
    )

    n_devices = len(jax.devices())
    configs = [(1, k) for k in (1, 2, 4, 8) if k <= n_devices]
    if n_devices >= 8:
        configs.append((2, 4))

    batch = args.per_device_batch
    vert = args.vertexes

    class _Cfg:
        g_lr = d_lr = 1e-5
        beta1, beta2 = 0.9, 0.999
        adam_weight_decay = 0.01

    results = []
    base = None
    for dp, tp in configs:
        if args.dim % tp:
            print(json.dumps({"mesh": f"{dp}x{tp}",
                              "skipped": f"dim {args.dim} % tp {tp} != 0"}))
            continue
        g = Generator(act="relu", vertexes=vert, edges=b_dim, nodes=m_dim,
                      dropout=0.0, dim=args.dim, depth=args.depth,
                      heads=args.heads, mlp_ratio=3)
        d = Discriminator(act="relu", vertexes=vert, edges=b_dim,
                          nodes=m_dim, dropout=0.0, dim=args.dim,
                          heads=args.heads, depth=args.depth, mlp_ratio=3)
        g_opt, d_opt = make_optimizers(_Cfg())
        mesh = make_dp_tp_mesh(dp, tp)
        state = shard_gan_state_tp(mesh, init_state(
            g, d, g_opt, d_opt, jax.random.PRNGKey(0), vert, m_dim, b_dim))
        step = make_train_step(g, d, g_opt, d_opt, lambda_gp=10.0,
                               m_dim=m_dim, b_dim=b_dim,
                               compute_dtype=compute_dtype, donate=False)
        rng = np.random.default_rng(0)
        x = rng.integers(0, m_dim, (batch, vert)).astype(np.int8)
        a0 = np.triu(rng.integers(0, b_dim, (batch, vert, vert)), 1)
        a = (a0 + a0.transpose(0, 2, 1)).astype(np.int8)
        xb, ab, dxb, dab = shard_batch(mesh, x, a, x.copy(), a.copy())
        key = jax.random.PRNGKey(1)
        metrics = None
        for _ in range(2):
            state, metrics, _ = step(state, key, xb, ab, dxb, dab)
        float(metrics["d_loss"])

        def chain(k, st):
            t0 = time.perf_counter()
            last = None
            for _ in range(k):
                st, last, _ = step(st, key, xb, ab, dxb, dab)
            float(last["d_loss"])
            return time.perf_counter() - t0, st

        w_small, state = chain(2, state)
        w_large, state = chain(2 + args.iters, state)
        sec = max((w_large - w_small) / args.iters, 1e-9)
        mols = batch / sec
        edges = mols * vert * vert
        if base is None:
            base = mols
        results.append({"mesh": f"{dp}x{tp}", "devices": dp * tp,
                        "batch": batch, "dim": args.dim,
                        "step_seconds": round(sec, 5),
                        "mols_per_s": round(mols, 1),
                        "edges_per_s": round(edges, 1),
                        "speedup_vs_1dev": round(mols / base, 3)})
        print(json.dumps(results[-1]))
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
