#!/usr/bin/env python
"""Throughput benchmark.

Measures the full WGAN-GP training-step throughput of the default DrugGEN
configuration (batch 128, N=45, dim 128, depth 1, heads 8 — reference
train.py:410-433) on the available accelerator and prints ONE JSON line:

    {"metric": "molecules_per_second", "value": ..., "unit": "mol/s",
     "vs_baseline": ...}

The reference publishes no throughput numbers (BASELINE.md), so
``vs_baseline`` is measured against a live PyTorch-CPU re-execution of the
same math when ``--torch-baseline`` is passed, else reported as 1.0.

Also reports edges/s (= mol/s * N^2, the BASELINE.json scaling metric).
"""

from __future__ import annotations

import argparse
import json
import os
import time


def build(batch: int, vertexes: int, dim: int, depth: int, heads: int,
          use_pallas: bool, compute_dtype: str, remat: bool = False,
          fused_mlp: bool = False, gp_mode: str = "revrev",
          share_fake="auto", scan_layers: bool = False,
          fused_critic: bool = False, split_step: bool = False,
          gp_f32: bool = False, f32_stats: bool = False):
    import numpy as np

    import jax

    from druggen_tpu.chem.vocab import CHEMBL_VOCAB
    from druggen_tpu.config import TrainConfig
    from druggen_tpu.models import Discriminator, Generator
    from druggen_tpu.parallel import make_mesh, shard_batch, shard_state
    from druggen_tpu.train.step import (
        init_state,
        make_optimizers,
        make_train_step,
    )
    import jax.numpy as jnp

    vocab = CHEMBL_VOCAB
    m_dim, b_dim = vocab.m_dim, vocab.b_dim
    cdtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    cfg = TrainConfig(raw_file="x", drug_raw_file="y", batch_size=batch,
                      max_atom=vertexes, dim=dim, heads=heads, mlp_ratio=3)
    kwargs = dict(act="relu", vertexes=vertexes, edges=b_dim, nodes=m_dim,
                  dropout=0.0, dim=dim, depth=depth, heads=heads,
                  mlp_ratio=3,
                  dtype=None if cdtype == jnp.float32 else cdtype)
    # Pallas on G only; D's GP double-backward needs the XLA path
    g = Generator(use_pallas=use_pallas, remat=remat, fused_mlp=fused_mlp,
                  scan_layers=scan_layers, **kwargs)
    d = Discriminator(use_pallas=False, remat=remat,
                      scan_layers=scan_layers, **kwargs)
    g_opt, d_opt = make_optimizers(cfg)
    mesh = make_mesh()
    state = shard_state(mesh, init_state(
        g, d, g_opt, d_opt, jax.random.PRNGKey(0), vertexes, m_dim, b_dim))
    if split_step:
        from druggen_tpu.train.step import make_split_train_step

        step = make_split_train_step(
            g, d, g_opt, d_opt, lambda_gp=10.0, m_dim=m_dim, b_dim=b_dim,
            submodel="DrugGEN", compute_dtype=cdtype, gp_mode=gp_mode,
            fused_critic=fused_critic, gp_f32=gp_f32, f32_stats=f32_stats)
    else:
        step = make_train_step(g, d, g_opt, d_opt, lambda_gp=10.0,
                               m_dim=m_dim, b_dim=b_dim, submodel="DrugGEN",
                               compute_dtype=cdtype, gp_mode=gp_mode,
                               share_fake=share_fake,
                               fused_critic=fused_critic, gp_f32=gp_f32,
                               f32_stats=f32_stats)

    rng = np.random.default_rng(0)
    x = rng.integers(0, m_dim, (batch, vertexes)).astype(np.int8)
    a0 = np.triu(rng.integers(0, b_dim, (batch, vertexes, vertexes)), 1)
    a = (a0 + a0.transpose(0, 2, 1)).astype(np.int8)
    dx = rng.integers(0, m_dim, (batch, vertexes)).astype(np.int8)
    da = a.copy()
    xb, ab, dxb, dab = shard_batch(mesh, x, a, dx, da)
    key = jax.random.PRNGKey(1)
    return state, step, (key, xb, ab, dxb, dab)


def bench_step(state, step, args, warmup: int = 2, k_small: int = 5,
               k_large: int = 20) -> float:
    """Seconds per training step: marginal cost between a K-small and a
    K-large dispatch chain, each terminated by a device->host value fetch.

    NOTE on methodology: through the remote-TPU relay used in this
    environment, ``jax.block_until_ready`` returns before execution
    completes, so per-step median timing wildly under-reports.  Fetching a
    computed scalar (``float(loss)``) is the only hard sync; the marginal
    slope between two chain lengths cancels the dispatch/round-trip
    constant and measures sustained training throughput."""
    key = args[0]
    metrics = None
    for _ in range(warmup):
        state, metrics, _ = step(state, key, *args[1:])
    float(metrics["d_loss"])  # hard sync

    def chain(k, st):
        t0 = time.perf_counter()
        last = None
        for _ in range(k):
            st, last, _ = step(st, key, *args[1:])
        float(last["d_loss"])  # hard sync
        return time.perf_counter() - t0, st

    w_small, state = chain(k_small, state)
    w_large, state = chain(k_large, state)
    slope = (w_large - w_small) / (k_large - k_small)
    # a non-positive slope means timing noise swamped the marginal cost
    # (tiny CPU runs); fall back to the conservative mean per-step
    return slope if slope > 0 else w_large / k_large


def torch_baseline_seconds(batch: int, vertexes: int, dim: int, depth: int,
                           heads: int) -> float | None:
    """Reference-equivalent PyTorch-CPU step time (fresh implementation of
    the same D-step + GP + G-step math, not a copy)."""
    try:
        import torch
        import torch.nn as nn
    except ImportError:
        return None
    from druggen_tpu.chem.vocab import CHEMBL_VOCAB

    m_dim, b_dim = CHEMBL_VOCAB.m_dim, CHEMBL_VOCAB.b_dim
    d_k = dim // heads

    class Blk(nn.Module):
        def __init__(self):
            super().__init__()
            self.ln = nn.ModuleList([nn.LayerNorm(dim) for _ in range(5)])
            self.q, self.k, self.v, self.e, self.oe, self.on = (
                nn.Linear(dim, dim), nn.Linear(dim, dim), nn.Linear(dim, dim),
                nn.Linear(dim, dim), nn.Linear(dim, dim), nn.Linear(dim, dim))
            self.m1 = nn.Sequential(nn.Linear(dim, 3 * dim), nn.ReLU(),
                                    nn.Linear(3 * dim, dim))
            self.m2 = nn.Sequential(nn.Linear(dim, 3 * dim), nn.ReLU(),
                                    nn.Linear(3 * dim, dim))

        def forward(self, x, y):
            b, n, c = x.shape
            x1 = self.ln[0](x)
            q = self.q(x1).view(b, n, heads, d_k).unsqueeze(2)
            k = self.k(x1).view(b, n, heads, d_k).unsqueeze(1)
            v = self.v(x1).view(b, n, heads, d_k).unsqueeze(1)
            e = self.e(y).view(b, n, n, heads, d_k)
            att = (q * k) / (d_k ** 0.5) * (e + 1) * e
            y1 = self.oe(att.flatten(3))
            att = torch.softmax(att, dim=2)
            x2 = self.on((att * v).sum(2).flatten(2))
            x2 = x1 + x2
            y2 = y + y1
            x2, y2 = self.ln[1](x2), self.ln[2](y2)
            return self.ln[3](x2 + self.m1(x2)), self.ln[4](y2 + self.m2(y2))

    class Net(nn.Module):
        def __init__(self, head):
            super().__init__()
            self.nf = nn.Sequential(nn.Linear(m_dim, 64), nn.ReLU(),
                                    nn.Linear(64, dim), nn.ReLU())
            self.ef = nn.Sequential(nn.Linear(b_dim, 64), nn.ReLU(),
                                    nn.Linear(64, dim), nn.ReLU())
            self.blocks = nn.ModuleList([Blk() for _ in range(depth)])
            self.head = head
            if head == "gen":
                self.rn = nn.Linear(dim, m_dim)
                self.re = nn.Linear(dim, b_dim)
            else:
                self.mlp = nn.Sequential(
                    nn.Linear(vertexes * dim, 64), nn.ReLU(),
                    nn.Linear(64, 32), nn.ReLU(), nn.Linear(32, 16),
                    nn.ReLU(), nn.Linear(16, 1))

        def forward(self, ze, zn):
            x = self.nf(zn)
            y = self.ef(ze)
            y = (y + y.permute(0, 2, 1, 3)) / 2
            for blk in self.blocks:
                x, y = blk(x, y)
            if self.head == "gen":
                return self.rn(x), self.re(y)
            return self.mlp(x.flatten(1))

    G, D = Net("gen"), Net("disc")
    go = torch.optim.AdamW(G.parameters(), 1e-5)
    do = torch.optim.AdamW(D.parameters(), 1e-5)
    ze = torch.randn(batch, vertexes, vertexes, b_dim)
    zn = torch.randn(batch, vertexes, m_dim)

    def one_step():
        do.zero_grad()
        nl, el = G(ze, zn)
        real = D(ze, zn).mean()
        fake = D(el.detach(), nl.detach()).mean()
        eps_n = torch.rand(batch, 1, 1)
        eps_e = torch.rand(batch, 1, 1, 1)
        int_n = (eps_n * zn + (1 - eps_n) * nl.detach()).requires_grad_(True)
        int_e = (eps_e * ze + (1 - eps_e) * el.detach()).requires_grad_(True)
        out = D(int_e, int_n)
        grads = torch.autograd.grad(out.sum(), [int_n, int_e],
                                    create_graph=True)
        gcat = torch.cat([g.reshape(batch, -1) for g in grads], 1)
        gp = ((gcat.norm(2, dim=1) - 1) ** 2).mean()
        (fake - real + 10 * gp).backward()
        do.step()
        go.zero_grad()
        nl, el = G(ze, zn)
        (-D(el, nl).mean()).backward()
        go.step()

    one_step()  # warmup
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        one_step()
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def build_infer(batch: int, vertexes: int, dim: int, depth: int, heads: int,
                use_pallas: bool, compute_dtype: str,
                fused_mlp: bool = False):
    """Pure generator forward (the inference hot loop, engine.py:72-110):
    one-hot encode int8 labels on device, G forward, argmax decode."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from druggen_tpu.chem.vocab import CHEMBL_VOCAB
    from druggen_tpu.models import Generator

    vocab = CHEMBL_VOCAB
    m_dim, b_dim = vocab.m_dim, vocab.b_dim
    cdtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    g = Generator(act="relu", vertexes=vertexes, edges=b_dim, nodes=m_dim,
                  dropout=0.0, dim=dim, depth=depth, heads=heads, mlp_ratio=3,
                  fused_mlp=fused_mlp,
                  dtype=None if cdtype == jnp.float32 else cdtype)
    params = g.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, vertexes, vertexes, b_dim)),
                    jnp.zeros((1, vertexes, m_dim)))

    if use_pallas:
        from druggen_tpu.ops.fused_generator import fused_generator_logits

        @jax.jit
        def forward(params, a_labels, x_labels):
            a = jax.nn.one_hot(a_labels, b_dim, dtype=cdtype)
            x = jax.nn.one_hot(x_labels, m_dim, dtype=cdtype)
            nl, el = fused_generator_logits(params, a, x, heads=heads)
            return (jnp.argmax(nl, -1).astype(jnp.int32),
                    jnp.argmax(el, -1).astype(jnp.int32))
    else:
        @jax.jit
        def forward(params, a_labels, x_labels):
            a = jax.nn.one_hot(a_labels, b_dim, dtype=cdtype)
            x = jax.nn.one_hot(x_labels, m_dim, dtype=cdtype)
            _, _, nl, el = g.apply(params, a, x)
            return (jnp.argmax(nl, -1).astype(jnp.int32),
                    jnp.argmax(el, -1).astype(jnp.int32))

    rng = np.random.default_rng(0)
    x = rng.integers(0, m_dim, (batch, vertexes)).astype(np.int8)
    a0 = np.triu(rng.integers(0, b_dim, (batch, vertexes, vertexes)), 1)
    a = (a0 + a0.transpose(0, 2, 1)).astype(np.int8)
    return params, forward, (a, x)


def bench_infer(params, forward, args, k_small: int = 5,
                k_large: int = 20) -> float:
    """Marginal-slope timing of the inference forward (same relay-safe
    protocol as bench_step; the argmax fetch is the hard sync)."""
    a, x = args
    n_labels, _ = forward(params, a, x)
    int(n_labels[0, 0])  # warmup + hard sync

    def chain(k):
        t0 = time.perf_counter()
        last = None
        for _ in range(k):
            last, _ = forward(params, a, x)
        int(last[0, 0])
        return time.perf_counter() - t0

    w_small = chain(k_small)
    w_large = chain(k_large)
    slope = (w_large - w_small) / (k_large - k_small)
    return slope if slope > 0 else w_large / k_large


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["train", "infer"], default="train")
    # The environment pins JAX_PLATFORMS=axon via sitecustomize; the env
    # var alone cannot override it (CLAUDE.md).  --platform cpu forces the
    # CPU backend before any backend use, keeping smoke runs off the relay.
    p.add_argument("--platform", default=None)
    # Defaults are the best measured single-chip configuration (PERF.md
    # sweep: bf16 halves the HBM traffic of this bandwidth-bound step and
    # batch 512 amortizes dispatch); model shape stays the reference
    # default (N=45, dim 128, depth 1, heads 8 — train.py:410-433).
    p.add_argument("--batch", type=int, default=768,
                   help="768 measured best twice across sessions (5,314 "
                        "r1 / 5,310 r2 mol/s vs ~5,25x at 512; PERF.md)")
    p.add_argument("--vertexes", type=int, default=45)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--depth", type=int, default=1)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--use-pallas", action="store_true")
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint each encoder block (recompute "
                        "edge-stream intermediates in backward)")
    p.add_argument("--fused-mlp", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="fused LN->MLP->LN Pallas edge-tail kernel on the "
                        "Generator (train mode; first-order AD only). "
                        "Default ON: measured +15%% over XLA (PERF.md)")
    p.add_argument("--gp-mode", default="revrev",
                   choices=["revrev", "fwdrev"],
                   help="gradient-penalty AD structure (fwdrev = "
                        "reverse-over-forward, same gradients)")
    p.add_argument("--fused-critic", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="fused edge-tail kernel on the critic's first-order "
                        "passes (GP stays XLA). Default ON: +7.6%% at "
                        "depth 2, neutral at depth 1 (PERF.md)")
    p.add_argument("--fused-block", action="store_true",
                   help="v5 megablock kernel (ops/fused_block.py): each "
                        "encoder block's WHOLE edge stream — attention + "
                        "LN/MLP tail — in one Pallas residency, on the "
                        "Generator and the critic's first-order passes "
                        "(overrides --fused-mlp / --fused-critic)")
    p.add_argument("--split-step", action="store_true",
                   help="two compiled programs per iteration (D update "
                        "incl. GP, then G update) — the deep-config "
                        "compile workaround; costs one extra dispatch")
    p.add_argument("--scan-layers", action="store_true",
                   help="lax.scan over stacked encoder blocks (depth-"
                        "independent compile time; deep configs)")
    p.add_argument("--no-share-fake", action="store_true",
                   help="disable the single-G-forward vjp reuse (A/B knob; "
                        "default 'auto' enables it at dropout 0)")
    p.add_argument("--compute-dtype", default="bfloat16")
    p.add_argument("--gp-f32", action="store_true",
                   help="numerics-ladder tier 1: f32 gradient-penalty "
                        "pass (trainer gp_f32=on)")
    p.add_argument("--f32-stats", action="store_true",
                   help="numerics-ladder tier 2: f32 LayerNorm/softmax "
                        "reductions (fused kernels drop out)")
    p.add_argument("--torch-baseline", action="store_true")
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    metric = ("train_molecules_per_second" if args.mode == "train"
              else "infer_molecules_per_second")
    if args.fused_block:
        args.fused_mlp = "block"
    try:
        if args.mode == "train":
            state, step, step_args = build(
                args.batch, args.vertexes, args.dim, args.depth, args.heads,
                args.use_pallas, args.compute_dtype, args.remat,
                args.fused_mlp, args.gp_mode,
                False if args.no_share_fake else "auto", args.scan_layers,
                "block" if args.fused_block else args.fused_critic,
                args.split_step, args.gp_f32, args.f32_stats)
            sec = bench_step(state, step, step_args,
                             k_large=max(args.iters, 10))
        else:
            if (args.fused_mlp and args.compute_dtype == "float32"
                    and not os.environ.get("DRUGGEN_ALLOW_F32_FUSED")):
                # round 1 measured 3.6k vs 10.5k mol/s with bf16-sized
                # tiles; the tiles are dtype-aware now
                # (fused_mlp._tile_rows) — set DRUGGEN_ALLOW_F32_FUSED=1
                # to measure the f32 kernel path
                import sys
                print("note: disabling fused_mlp for float32 inference "
                      "(set DRUGGEN_ALLOW_F32_FUSED=1 to keep it)",
                      file=sys.stderr)
                args.fused_mlp = False
            params, fwd, fwd_args = build_infer(
                args.batch, args.vertexes, args.dim, args.depth, args.heads,
                args.use_pallas, args.compute_dtype, args.fused_mlp)
            sec = bench_infer(params, fwd, fwd_args,
                              k_large=max(args.iters, 10))
    except Exception as e:  # the remote-TPU relay occasionally 500s on
        # large compiles (PERF.md); emit a well-formed error record rather
        # than crashing so the driver still gets its JSON line
        print(json.dumps({
            "metric": metric,
            "value": 0.0,
            "unit": "mol/s",
            "vs_baseline": 0.0,
            "extra": {"error": f"{type(e).__name__}: {e}"[:300]},
        }))
        return
    mols_per_s = args.batch / sec
    edges_per_s = mols_per_s * args.vertexes ** 2

    vs_baseline = 1.0
    if args.torch_baseline and args.mode == "train":
        tb = torch_baseline_seconds(args.batch, args.vertexes, args.dim,
                                    args.depth, args.heads)
        if tb:
            vs_baseline = tb / sec
    elif args.mode == "train":
        # fall back to the RECORDED torch-CPU baseline (BASELINE_TORCH.json,
        # measured by a --torch-baseline run) scaled to this batch size, so
        # vs_baseline is a real ratio instead of a self-referential 1.0
        try:
            with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "BASELINE_TORCH.json")) as f:
                rec = json.load(f)
            if (args.vertexes == 45 and args.dim == 128
                    and args.depth == 1 and args.heads == 8):
                # linear batch scaling of the recorded batch-512 torch time
                # (the torch step is bandwidth/compute linear in B)
                tb = rec["torch_cpu_step_seconds"] * (args.batch / 512.0)
                vs_baseline = tb / sec
        except (OSError, KeyError, ValueError):
            pass

    # build() constructs G with dropout=0.0, so share_fake='auto' resolves
    # to True; the label reflects the resolved value, not just the flag.
    # split_step cannot share across programs -> always 2 G forwards.
    share_fake_resolved = not args.no_share_fake and not args.split_step
    g_fwds = "1 shared G fwd" if share_fake_resolved else "2 G fwd"
    workload = (f"full WGAN-GP step ({g_fwds}, 4 D fwd, double bwd)"
                if args.mode == "train"
                else "G forward + argmax decode (inference hot loop)")
    print(json.dumps({
        "metric": metric,
        "value": round(mols_per_s, 2),
        "unit": "mol/s",
        "vs_baseline": round(vs_baseline, 3),
        "extra": {
            "step_seconds": round(sec, 5),
            "edges_per_second": round(edges_per_s, 1),
            "batch": args.batch,
            "config": f"N{args.vertexes}_dim{args.dim}_depth{args.depth}"
                      f"_heads{args.heads}_{args.compute_dtype}"
                      f"{'_pallas' if args.use_pallas else ''}"
                      f"{'_fusedblock' if args.fused_mlp == 'block' else ('_fusedmlp' if args.fused_mlp else '')}"
                      f"{'_gpf32' if args.gp_f32 else ''}"
                      f"{'_f32stats' if args.f32_stats else ''}"
                      f"{'_fwdrev' if args.gp_mode == 'fwdrev' else ''},"
                      + workload,
        },
    }))


if __name__ == "__main__":
    main()
