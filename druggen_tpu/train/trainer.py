"""Trainer orchestration.

The analogue of the reference ``Train`` class (``train.py:25-397``): config
capture, seeding, vocab + two datasets (ChEMBL-style + drug-target), model
build with shape inference from the data, and the epoch/iteration loop with
the reference's cadence — per-step loss logging, per-``log_sample_step``
chemical metrics + sample dumps + checkpoints.

TPU-first differences from the reference:
- the whole D-then-G iteration is one jitted SPMD program
  (:mod:`druggen_tpu.train.step`), batches are int8 label tensors sharded
  over the ``data`` mesh axis (replacing nn.DataParallel, train.py:220-223);
- RDKit-equivalent work (decode + metrics) happens only at the logging
  cadence, outside the device loop;
- checkpoints carry optimizer state + step for exact resume (the reference
  restarts optimizers silently).
"""

from __future__ import annotations

import os
import random

import numpy as np

import jax
import jax.numpy as jnp

from druggen_tpu.chem.fingerprints import fingerprints_for_smiles
from druggen_tpu.chem.vocab import Vocab, get_vocab, read_smiles_file
from druggen_tpu.config import TrainConfig
from druggen_tpu.data.dataset import BatchIterator, GraphData, load_dataset
from druggen_tpu.models import Discriminator, Generator
from druggen_tpu.parallel import make_mesh, shard_batch, shard_state
from druggen_tpu.parallel.mesh import global_batch_from_local
from druggen_tpu.train import checkpoint as ckpt
from druggen_tpu.train.step import (
    GANState,
    init_state,
    make_optimizers,
    make_train_step,
)
from druggen_tpu.utils.logging import RunLogger
from druggen_tpu.utils.sampling import save_sample_artifacts, training_metrics


class Trainer:
    def __init__(self, cfg: TrainConfig, vocab: Vocab | None = None,
                 data: GraphData | None = None,
                 drug_data: GraphData | None = None):
        self.cfg = cfg
        if cfg.set_seed:
            np.random.seed(cfg.seed)
            random.seed(cfg.seed)
            os.environ["PYTHONHASHSEED"] = str(cfg.seed)

        if cfg.platform:
            jax.config.update("jax_platforms", cfg.platform)

        # multi-host bring-up before any backend use (SURVEY.md §2.2)
        self.host_id, self.num_hosts = 0, 1
        if cfg.distributed:
            from druggen_tpu.parallel.mesh import init_distributed

            self.host_id, self.num_hosts = init_distributed(
                cfg.coordinator_address, cfg.num_processes, cfg.process_id)
            print(f"multi-host: process {self.host_id}/{self.num_hosts}, "
                  f"{len(jax.devices())} global devices")

        # ---- data (reference train.py:76-115)
        self.vocab = vocab or get_vocab(
            cfg.raw_file, cfg.drug_raw_file, cfg.max_atom,
            cache_dir=os.path.join(cfg.mol_data_dir, "vocab"),
            union_ref12=getattr(cfg, "vocab_ref12", False))
        self.data = data if data is not None else load_dataset(
            cfg.raw_file, self.vocab, cfg.max_atom, cfg.mol_data_dir,
            features=cfg.features)
        self.drug_data = drug_data if drug_data is not None else load_dataset(
            cfg.drug_raw_file, self.vocab, cfg.max_atom, cfg.drug_data_dir,
            features=cfg.features)

        # shape inference from the dataset (reference train.py:117-119:
        # m_dim = atom types, or the widened one-hot+features block width)
        self.m_dim = self.vocab.m_dim + self.data.feature_dim
        self.b_dim = self.vocab.b_dim
        self.vertexes = int(self.data.x.shape[1])

        # edge-partitioned (giant-batch) mode: pad the vertex axes so the
        # 'node' mesh axis divides them (PAD labels are exact no-op
        # semantics — see data.dataset.pad_vertices)
        self.node_k = max(getattr(cfg, "mesh_node", 1), 1)
        if self.node_k > 1:
            if cfg.features:
                raise ValueError("mesh_node > 1 does not support --features")
            if cfg.dropout or cfg.ddropout:
                raise ValueError("mesh_node > 1 requires dropout=0 "
                                 "(the reference default)")
            if cfg.distributed and self.num_hosts > 1:
                # multi-host composition: the ('data','node') mesh is laid
                # out host-major (make_edge_mesh reshapes jax.devices(),
                # which orders devices by process), so each host owns whole
                # 'data' rows iff node_k divides its local device count —
                # then shard_train_inputs assembles the global batch from
                # per-host BatchIterator shards with no cross-host copies.
                n_local = len(jax.local_devices())
                if n_local % self.node_k:
                    raise ValueError(
                        f"mesh_node={self.node_k} must divide the per-host "
                        f"device count ({n_local}) so 'data' rows do not "
                        f"straddle hosts")
            if self.vertexes % self.node_k:
                from druggen_tpu.data.dataset import pad_vertices

                to = -(-self.vertexes // self.node_k) * self.node_k
                self.data = pad_vertices(self.data, to)
                self.drug_data = pad_vertices(self.drug_data, to)
                self.vertexes = to
                print(f"mesh_node={self.node_k}: padded vertexes to {to}")

        self.compute_dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                              else jnp.float32)

        # ---- models + optimizers (reference build_model, train.py:164-226)
        common = dict(act=cfg.act, vertexes=self.vertexes, edges=self.b_dim,
                      nodes=self.m_dim, dim=cfg.dim, heads=cfg.heads,
                      mlp_ratio=cfg.mlp_ratio,
                      dtype=None if self.compute_dtype == jnp.float32
                      else self.compute_dtype)
        # Pallas goes to G only: the gradient penalty double-differentiates
        # D, and custom_vjp kernels do not support second-order AD (see
        # druggen_tpu/ops/fused_attention.py docstring)
        scan_layers = getattr(cfg, "scan_layers", False)
        # --fused_block routes each encoder block's whole edge stream
        # through the v5 megablock kernel (fused_mlp="block"); the critic's
        # first-order passes follow suit via fused_critic="block" below
        fused_mlp = ("block" if getattr(cfg, "fused_block", False)
                     else getattr(cfg, "fused_mlp", False))
        self.G = Generator(dropout=cfg.dropout, depth=cfg.depth,
                           use_pallas=cfg.use_pallas,
                           fused_mlp=fused_mlp,
                           scan_layers=scan_layers, **common)
        self.D = Discriminator(dropout=cfg.ddropout, depth=cfg.ddepth,
                               use_pallas=False, scan_layers=scan_layers,
                               head_mult=getattr(cfg, "d_head_mult", 1),
                               **common)
        self.g_opt, self.d_opt = make_optimizers(cfg)

        self.tp_k = max(getattr(cfg, "mesh_model", 1), 1)
        if self.tp_k > 1 and self.node_k > 1:
            raise ValueError("mesh_model and mesh_node are mutually "
                             "exclusive for now")
        if self.node_k > 1:
            from druggen_tpu.parallel.edge_partition import (
                make_edge_mesh,
                make_sharded_train_step,
                shard_train_inputs,
            )

            n_dev = len(jax.devices())
            dp = cfg.mesh_data if cfg.mesh_data > 0 else max(
                n_dev // self.node_k, 1)
            self.mesh = make_edge_mesh(dp, self.node_k)
            self._shard_fn = lambda *arrs: shard_train_inputs(self.mesh,
                                                              *arrs)
        elif self.tp_k > 1:
            from druggen_tpu.parallel.tensor_parallel import make_dp_tp_mesh

            if cfg.dim % self.tp_k:
                raise ValueError(f"dim={cfg.dim} not divisible by "
                                 f"mesh_model={self.tp_k}")
            n_dev = len(jax.devices())
            dp = cfg.mesh_data if cfg.mesh_data > 0 else max(
                n_dev // self.tp_k, 1)
            self.mesh = make_dp_tp_mesh(dp, self.tp_k)
            self._shard_fn = lambda *arrs: global_batch_from_local(self.mesh,
                                                                   *arrs)
        else:
            self.mesh = make_mesh(cfg.mesh_data)
            self._shard_fn = lambda *arrs: global_batch_from_local(self.mesh,
                                                                   *arrs)
        self.key = jax.random.PRNGKey(cfg.seed)
        state = init_state(self.G, self.D, self.g_opt, self.d_opt,
                           jax.random.fold_in(self.key, 0), self.vertexes,
                           self.m_dim, self.b_dim)
        if self.tp_k > 1:
            from druggen_tpu.parallel.tensor_parallel import (
                shard_gan_state_tp,
            )

            self.state = shard_gan_state_tp(self.mesh, state)
        else:
            self.state = shard_state(self.mesh, state)
        # ---- numerics ladder (PERF.md rounds 4-5): under bf16 compute the
        # step escalates through progressively safer/slower programs the
        # first time the fetched loss window shows a non-finite value:
        #   tier 0  all-bf16 (fastest; GP NaNs once critic weights grow)
        #   tier 1  f32 gradient-penalty pass        (gp_f32)
        #   tier 2  + f32 LayerNorm/softmax reductions (f32_stats)
        #   tier 3  whole step in f32 — the reference's own numerics
        # Each tier is one recompile against the same state object; the
        # non-finite barrier (apply_if_all_finite) keeps params clean
        # through the triggering steps.
        def _mode(name, default="auto", allowed=("auto", "on", "off")):
            v = getattr(cfg, name, default)
            if isinstance(v, bool):                 # programmatic callers
                v = "on" if v else "off"
            if v not in allowed:
                raise ValueError(f"{name} must be one of {allowed}, "
                                 f"got {v!r}")
            return v

        gp_f32_cfg = _mode("gp_f32")
        f32_stats_cfg = _mode("f32_stats")
        f32_full_cfg = _mode("f32_full", allowed=("auto", "off", "on"))
        if self.compute_dtype == jnp.float32:
            start_tier, ladder = 0, []
        else:
            start_tier = (2 if f32_stats_cfg == "on"
                          else 1 if gp_f32_cfg == "on" else 0)
            allowed = {1: gp_f32_cfg == "auto", 2: f32_stats_cfg == "auto",
                       3: f32_full_cfg == "auto"}
            ladder = [t for t in (1, 2, 3)
                      if t > start_tier and allowed[t]]
        self._numerics_tier = start_tier
        self._ladder = ladder
        self._ladder_exhausted_warned = False
        step_kwargs = dict(lambda_gp=cfg.lambda_gp, m_dim=self.m_dim,
                           b_dim=self.b_dim, submodel=cfg.submodel,
                           compute_dtype=self.compute_dtype,
                           node_mode="dense" if cfg.features else "labels",
                           gp_mode=getattr(cfg, "gp_mode", "revrev"),
                           fused_critic=("block" if getattr(
                               cfg, "fused_block", False)
                               else getattr(cfg, "fused_critic", False)))
        self._step_kwargs = step_kwargs
        if self.node_k > 1 and cfg.steps_per_dispatch > 1:
            print("mesh_node > 1: steps_per_dispatch ignored")
        if getattr(cfg, "split_step", False) and cfg.steps_per_dispatch > 1:
            print("split_step: steps_per_dispatch ignored")
        self._build_step_fns(start_tier)

        # ---- dirs + logging (reference train.py:283-289)
        self.run_name = cfg.run_name
        self.model_dir = os.path.join(cfg.model_save_dir, self.run_name)
        self.sample_dir = os.path.join(cfg.sample_dir, self.run_name)
        os.makedirs(self.model_dir, exist_ok=True)
        os.makedirs(self.sample_dir, exist_ok=True)
        self.logger = RunLogger(cfg.log_dir, self.run_name,
                                use_wandb=cfg.use_wandb, online=cfg.online,
                                config=vars(cfg))
        self._write_module_summaries()

        # drug fingerprints for SNN metric (reference train.py:292-294)
        self.drug_smiles = self.drug_data.smiles
        self.drug_fps = fingerprints_for_smiles(self.drug_smiles)

        # ---- resume
        if cfg.resume:
            if cfg.resume_epoch is not None and cfg.resume_iter is not None:
                directory = cfg.resume_directory or self.model_dir
                self.state = ckpt.restore_gd_params(
                    directory, self.state, cfg.resume_epoch, cfg.resume_iter)
                print(f"restored G/D params from {directory} "
                      f"{cfg.resume_epoch}-{cfg.resume_iter}")
            else:
                restored = ckpt.restore_state(
                    cfg.resume_directory or self.model_dir, self.state)
                if restored is not None:
                    self.state = shard_state(self.mesh, restored)
                    print(f"auto-resumed at step {int(restored.step)}")

    # ------------------------------------------------------------------
    def _write_module_summaries(self) -> None:
        """Param-shape dumps per model (reference print_network,
        train.py:228-248)."""
        for name, params in (("G", self.state.g_params),
                             ("D", self.state.d_params)):
            n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
            path = os.path.join(self.model_dir, f"{name}_modules.txt")
            with open(path, "w") as f:
                f.write(f"{name} ({type(self).__name__})\n")
                for p, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
                    keys = "/".join(str(getattr(k, 'key', k)) for k in p)
                    f.write(f"  - {keys}: {tuple(leaf.shape)}\n")
                f.write(f"Total number of parameters: {n_params}\n")

    # ------------------------------------------------------------------
    def _build_step_fns(self, tier: int) -> None:
        """(Re)build the jitted step for a numerics-ladder tier (the
        escalation recompile target; also called once from __init__)."""
        cfg = self.cfg
        G, D = self.G, self.D
        kw = dict(self._step_kwargs,
                  gp_f32=tier >= 1, f32_stats=tier >= 2)
        if tier >= 3:
            # whole step in f32 (reference numerics); params are f32
            # masters already, so the same state object carries over
            G = G.clone(dtype=None, use_pallas=False, fused_mlp=False)
            D = D.clone(dtype=None, use_pallas=False, fused_mlp=False)
            kw.update(compute_dtype=jnp.float32, fused_critic=False,
                      gp_f32=False, f32_stats=False)
        self.multi_step_fn = None
        if self.node_k > 1:
            from druggen_tpu.parallel.edge_partition import (
                make_sharded_train_step,
            )

            # full WGAN-GP step under shard_map on ('data','node'); the
            # fused_critic/gp_mode/steps_per_dispatch knobs apply to the
            # single-device step only
            self.step_fn = make_sharded_train_step(
                G, D, self.g_opt, self.d_opt, self.mesh,
                lambda_gp=cfg.lambda_gp, m_dim=self.m_dim,
                b_dim=self.b_dim, submodel=cfg.submodel,
                compute_dtype=kw["compute_dtype"],
                gp_f32=kw["gp_f32"], f32_stats=kw["f32_stats"])
        elif getattr(cfg, "split_step", False):
            from druggen_tpu.train.step import make_split_train_step

            kw.pop("share_fake", None)
            self.step_fn = make_split_train_step(
                G, D, self.g_opt, self.d_opt, **kw)
        else:
            self.step_fn = make_train_step(G, D, self.g_opt, self.d_opt,
                                           **kw)
            if cfg.steps_per_dispatch > 1:
                from druggen_tpu.train.step import make_multi_step

                self.multi_step_fn = make_multi_step(
                    G, D, self.g_opt, self.d_opt, **kw)

    @property
    def _gp_escalation_armed(self) -> bool:
        """Back-compat view: True while the gp_f32 tier can still fire."""
        return 1 in self._ladder

    def _escalate_gp(self) -> None:
        """Back-compat alias: advance the ladder one tier (historically the
        only escalation was bf16 -> f32 GP)."""
        self._escalate_numerics()

    def _escalate_numerics(self) -> None:
        """Advance to the next numerics-ladder tier (see __init__).

        Called from the loss-flush path each time a fetched loss window is
        non-finite and a higher tier remains: one recompile, same state
        object (the non-finite barrier has kept params clean through the
        triggering steps).  A window that goes non-finite AFTER the final
        tier means the nets themselves are stuck (CLAUDE.md: persistent
        nan d_loss = frozen critic) — warn once, keep training behind the
        barrier."""
        if not self._ladder:
            if not self._ladder_exhausted_warned:
                self._ladder_exhausted_warned = True
                print("numerics ladder exhausted: losses still non-finite "
                      "on the highest-precision program — params are "
                      "protected by the finite barrier, but the run needs "
                      "investigation (frozen critic?)", flush=True)
            return
        tier = self._ladder.pop(0)
        self._numerics_tier = tier
        names = {1: "f32 gradient-penalty pass",
                 2: "f32 gradient penalty + f32 LayerNorm/softmax",
                 3: "full-f32 step (reference numerics)"}
        print(f"numerics ladder: non-finite loss detected — escalating to "
              f"tier {tier}: {names[tier]} (one-time recompile)",
              flush=True)
        self._build_step_fns(tier)

    def _work_items(self, mol_iter, drug_iter, K: int, start_step: int = 0):
        """Per-dispatch work stream: ``(epoch, it_after, n_steps, arrays,
        multi)``.  All host-side batch assembly (slicing, K-stacking) lives
        here so a prefetch thread can overlap it with device execution.

        ``start_step`` resumes the schedule mid-run: epochs/iterations
        already covered by the restored global step are skipped and the
        drug stream is fast-forwarded to stay aligned, so a resumed run
        continues the ORIGINAL epoch plan (and checkpoint names) instead
        of replaying all ``cfg.epoch`` epochs on top — the reference
        (train.py:296-302) restarts its epoch loop after restoring
        weights, which both overshoots the schedule and overwrites
        earlier cadence checkpoints under the same names."""
        steps_per_epoch = len(mol_iter)
        start_epoch, skip = (divmod(start_step, steps_per_epoch)
                             if steps_per_epoch else (0, 0))
        for _ in range(start_step):     # drug stream is continuous across
            next(drug_iter)             # epochs: advance by ALL done steps
        for epoch in range(start_epoch, self.cfg.epoch):
            batch_stream = mol_iter.epoch_batches(epoch)
            it = -1
            if epoch == start_epoch and skip:
                it = skip - 1
                for _ in range(skip):   # mol stream alignment
                    if next(batch_stream, None) is None:
                        break
            for x, a in batch_stream:
                dx, da = next(drug_iter)
                if K > 1:
                    xs, as_, dxs, das = [x], [a], [dx], [da]
                    for _ in range(K - 1):
                        nxt = next(batch_stream, None)
                        if nxt is None:
                            break
                        xs.append(nxt[0])
                        as_.append(nxt[1])
                        d2 = next(drug_iter)
                        dxs.append(d2[0])
                        das.append(d2[1])
                    if len(xs) == K:
                        stack = tuple(np.stack(arr)
                                      for arr in (xs, as_, dxs, das))
                        it += len(xs)
                        yield epoch, it, len(xs), stack, True
                    else:
                        # tail smaller than K: single steps
                        for xt, at, dxt, dat in zip(xs, as_, dxs, das):
                            it += 1
                            yield epoch, it, 1, (xt, at, dxt, dat), False
                else:
                    it += 1
                    yield epoch, it, 1, (x, a, dx, da), False

    def train(self) -> GANState:
        cfg = self.cfg
        mol_iter = BatchIterator(self.data, cfg.batch_size, seed=cfg.seed,
                                 host_id=self.host_id,
                                 num_hosts=self.num_hosts)
        if cfg.submodel == "NoTarget":
            # the step ignores the drug inputs for NoTarget
            # (reference train.py:343-345); feed the mol batch as a
            # placeholder instead of consuming the (possibly tiny) drug set
            def _echo_mol():
                while True:
                    for batch in mol_iter.epoch_batches(10 ** 6):
                        yield batch

            drug_iter = _echo_mol()
        else:
            drug_iter = iter(BatchIterator(self.drug_data, cfg.batch_size,
                                           seed=cfg.seed, loop=True))
        # flush every loop-progress print: training often runs with stdout
        # redirected to a log file, where block buffering hides progress
        print(f"Start training... ({len(self.data)} mols, "
              f"{len(self.drug_data)} drugs, mesh={self.mesh.shape})")
        K = max(cfg.steps_per_dispatch, 1)

        # ---- pipelined host loop (closes the reference's per-iteration
        # host sync, train.py:318): the global step counter is tracked
        # host-side (fetching state.step would round-trip every iteration),
        # loss scalars are buffered as device arrays and fetched every
        # `log_flush_steps` dispatches — one hard sync amortized over the
        # window, which also bounds the device-queue depth — and batch
        # assembly runs on a prefetch thread.
        host_step = int(self.state.step)  # one sync (0 unless resumed)
        if host_step >= self.cfg.epoch * max(len(mol_iter), 1):
            print(f"resume: step {host_step} already completes the "
                  f"{self.cfg.epoch}-epoch schedule; nothing to do")
            return self.state
        # split_step dispatches two programs per iteration; halve the
        # window so in-flight executions stay within the relay's queue cap
        programs_per_dispatch = 2 if getattr(cfg, "split_step", False) else 1
        flush_every = max(getattr(cfg, "log_flush_steps", 16)
                          // programs_per_dispatch, 1)
        pending: list[tuple] = []   # (epoch, it, step, K_window, dev metrics)

        def flush() -> None:
            # float() on the newest scalar is the hard sync; everything
            # queued before it has then executed too
            import math

            saw_nonfinite = False
            for ep, it_, st_, kw, m in pending:
                d_val, g_val = float(m["d_loss"]), float(m["g_loss"])
                saw_nonfinite |= not (math.isfinite(d_val)
                                      and math.isfinite(g_val))
                self.logger.log({"epoch": ep, "iter": it_,
                                 "d_loss": d_val, "g_loss": g_val},
                                step=st_, echo=(it_ % 50 < kw))
            pending.clear()
            if saw_nonfinite:
                self._escalate_numerics()

        from druggen_tpu.utils.prefetch import prefetch

        work = prefetch(self._work_items(mol_iter, drug_iter, K,
                                         start_step=host_step),
                        getattr(cfg, "prefetch_depth", 2))
        for epoch, it, n_steps, arrays, multi in work:
            if multi:
                self.state, metrics_k, (node_logits, edge_logits) = \
                    self.multi_step_fn(self.state, self.key, *arrays)
                metrics = {"d_loss": metrics_k["d_loss"][-1],
                           "g_loss": metrics_k["g_loss"][-1]}
                x, a = arrays[0][-1], arrays[1][-1]
            else:
                xb, ab, dxb, dab = self._shard_fn(*arrays)
                self.state, metrics, (node_logits, edge_logits) = \
                    self.step_fn(self.state, self.key, xb, ab, dxb, dab)
                x, a = arrays[0], arrays[1]
            host_step += n_steps
            step = host_step
            pending.append((epoch, it, step, max(K, 1), metrics))
            at_cadence = step % cfg.log_sample_step < n_steps
            if len(pending) >= flush_every or at_cadence:
                flush()

            # cadence on the GLOBAL step, not the per-epoch iter: with
            # fewer steps per epoch than log_sample_step the per-epoch
            # counter never reaches the threshold and no samples or
            # mid-run checkpoints would ever be written
            if at_cadence:
                # in --features mode x is a dense block; recover atom
                # labels from the one-hot prefix for the real-side decode
                x_labels = (np.argmax(x[..., :self.vocab.m_dim], -1)
                            if cfg.features else x)
                chem = training_metrics(node_logits, edge_logits,
                                        x_labels, a,
                                        self.vocab, self.drug_smiles,
                                        self.drug_fps,
                                        max_atom=self.vertexes)
                self.logger.log(chem, step=step)
                n_valid = save_sample_artifacts(
                    self.sample_dir, epoch, it, node_logits, edge_logits,
                    self.vocab)
                print(f"samples saved at epoch {epoch} iteration {it} "
                      f"({n_valid} valid)", flush=True)
                ckpt.save_gd_params(self.model_dir, self.state,
                                    epoch + 1, it + 1)
                ckpt.save_state(self.model_dir, self.state)
                print(f"model saved at epoch {epoch} iteration {it}",
                      flush=True)
        flush()
        # final checkpoint + submodel export for inference
        ckpt.save_state(self.model_dir, self.state)
        ckpt.save_params(os.path.join(self.model_dir,
                                      f"{cfg.submodel}-G.ckpt"),
                         self.state.g_params)
        self.logger.finish()
        return self.state
