"""The jitted WGAN-GP train step.

The reference's per-iteration hot path (``train.py:302-397``, SURVEY.md
§3.1) is: 2 G forwards, 4 D forwards, one double-backward through D (the
gradient penalty), and two optimizer steps.  Here that whole iteration —
one-hot encoding included — is a **single jitted function**: no Python in
the loop, labels cross host->device as int8, XLA fuses the rest.

D is updated first, then G trains against the *updated* critic, matching
the reference's sequential ``d_optimizer.step(); ... g_optimizer.step()``
ordering exactly.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from druggen_tpu.train.losses import (
    discriminator_loss,
    generator_loss,
)


class GANState(NamedTuple):
    """Replicated training state (params + optimizer states + step)."""

    g_params: Any
    d_params: Any
    g_opt_state: Any
    d_opt_state: Any
    step: jnp.ndarray          # int32 scalar


def make_optimizers(cfg):
    """AdamW x2 with torch-default decoupled weight decay (reference
    train.py:213-214).

    When ``cfg.nonfinite_guard`` (default on), both optimizers are wrapped
    in :func:`apply_if_all_finite`: a step whose gradients, computed
    updates, or resulting optimizer state contain non-finite values is
    skipped entirely (params, moments and count untouched), so one bad
    step cannot poison the parameters.  A long-horizon bf16
    run on real silicon NaN'd at step ~50.7k and every subsequent
    checkpoint was garbage (experiments/r4_scale, PERF.md round 4) — the
    guard turns that from a run-killer into a skipped step.  Finite-step
    updates are bit-identical to the unwrapped optimizer."""
    g_opt = optax.adamw(cfg.g_lr, b1=cfg.beta1, b2=cfg.beta2,
                        weight_decay=cfg.adam_weight_decay)
    d_opt = optax.adamw(cfg.d_lr, b1=cfg.beta1, b2=cfg.beta2,
                        weight_decay=cfg.adam_weight_decay)
    if getattr(cfg, "nonfinite_guard", True):
        g_opt = apply_if_all_finite(g_opt)
        d_opt = apply_if_all_finite(d_opt)
    return g_opt, d_opt


class AllFiniteState(NamedTuple):
    notfinite_count: jnp.ndarray   # consecutive rejected steps (int32)
    total_notfinite: jnp.ndarray   # lifetime rejected steps (int32)
    inner_state: Any


def apply_if_all_finite(inner) -> "optax.GradientTransformation":
    """A stricter :func:`optax.apply_if_finite`: a step is applied only if
    the incoming gradients AND the computed updates AND the resulting
    inner optimizer state are all finite; otherwise params and inner
    state are left untouched (update = 0).

    Why not apply_if_finite: it only checks the incoming gradients, so a
    HUGE-but-finite gradient spike passes, overflows Adam's second moment
    (nu = grad^2 -> inf), then the first moment, and the optimizer then
    emits NaN *updates* from finite gradients — observed poisoning
    g_params at step ~77k of the reference-scale bf16 run (PERF.md round
    4) straight through the gradient-only guard.  Checking the full
    transition closes that hole, and unlike apply_if_finite there is no
    give-up count that eventually lets NaNs through."""

    def init(params):
        return AllFiniteState(
            notfinite_count=jnp.zeros([], jnp.int32),
            total_notfinite=jnp.zeros([], jnp.int32),
            inner_state=inner.init(params),
        )

    def _tree_finite(tree) -> jnp.ndarray:
        leaves = [jnp.all(jnp.isfinite(l)) for l in jax.tree_util.tree_leaves(tree)
                  if jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)]
        return jnp.all(jnp.stack(leaves)) if leaves else jnp.array(True)

    def update(updates, state, params=None):
        new_updates, new_inner = inner.update(updates, state.inner_state,
                                              params)
        ok = (_tree_finite(updates) & _tree_finite(new_updates)
              & _tree_finite(new_inner))
        pick = lambda a, b: jax.tree_util.tree_map(  # noqa: E731
            lambda x, y: jnp.where(ok, x, y), a, b)
        out_updates = pick(new_updates,
                           jax.tree_util.tree_map(jnp.zeros_like,
                                                  new_updates))
        out_inner = pick(new_inner, state.inner_state)
        return out_updates, AllFiniteState(
            notfinite_count=jnp.where(ok, 0, state.notfinite_count + 1),
            total_notfinite=state.total_notfinite + jnp.where(ok, 0, 1),
            inner_state=out_inner,
        )

    return optax.GradientTransformation(init, update)


def init_state(g_model, d_model, g_opt, d_opt, key, vertexes: int,
               m_dim: int, b_dim: int, compute_dtype=jnp.float32) -> GANState:
    kg, kd, kdg, kdd = jax.random.split(key, 4)
    z_e = jnp.zeros((1, vertexes, vertexes, b_dim), compute_dtype)
    z_n = jnp.zeros((1, vertexes, m_dim), compute_dtype)
    g_params = g_model.init({"params": kg, "dropout": kdg}, z_e, z_n)
    d_params = d_model.init({"params": kd, "dropout": kdd}, z_e, z_n)
    return GANState(
        g_params=g_params,
        d_params=d_params,
        g_opt_state=g_opt.init(g_params),
        d_opt_state=d_opt.init(d_params),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(g_model, d_model, g_opt, d_opt, *, lambda_gp: float,
                    m_dim: int, b_dim: int, submodel: str = "DrugGEN",
                    compute_dtype=jnp.float32, donate: bool = True,
                    node_mode: str = "labels", gp_mode: str = "revrev",
                    share_fake="auto", fused_critic: bool = False,
                    gp_f32: bool = False, f32_stats: bool = False):
    """Build the jitted step.

    step(state, key, x [B,N] int labels, a_labels [B,N,N] int,
         drug_x, drug_a_labels) -> (new_state, metrics dict,
         (node_logits, edge_logits)).

    ``key`` is the *base* PRNG key; per-step randomness is derived by
    folding in the step counter (deterministic resume).  For the NoTarget
    submodel the drug inputs are ignored and the critic sees the ChEMBL
    graphs themselves (reference train.py:340-345).

    ``node_mode='dense'`` (the --features flag path): x/drug_x arrive as
    pre-built float blocks [B,N,m_dim+F] instead of int labels.

    ``share_fake``: the reference runs the generator forward twice per
    iteration on the same inputs — once to make the D step's detached fake
    (loss.py:60) and once inside the G step (loss.py:80) — and G's params
    do not change in between, so the two forwards compute *identical*
    values when dropout is 0.  With ``share_fake`` the step does ONE
    ``jax.vjp`` G forward: its detached logits feed the D update and the
    G-step cotangents are pulled back through the saved linearization,
    removing a full G forward of HBM traffic.  Bit-identical losses and
    updates (tests/test_train_step.py).  "auto" enables it exactly when
    the generator's dropout rate is 0 (with dropout >0 the reference's
    second forward draws fresh masks, so sharing would change semantics).

    ``fused_critic``: run the critic's *first-order* passes (D-step real
    and fake, G-step fake) through the fused-MLP Pallas edge-tail kernel
    (``ops/fused_mlp.py``, first-order ``custom_vjp``).  Only the
    gradient-penalty pass is double-differentiated, so it alone stays on
    the fully twice-differentiable XLA path (``critic_gp``).  Identical
    parameters and math; pays off at critic depth > 1 where the edge
    stream is live between blocks."""
    if f32_stats and compute_dtype != jnp.float32:
        # f32-LN/softmax escalation tier (numerics ladder tier 2): the bf16
        # forward itself sat at the numeric edge in the round-4
        # reference-scale run.  Normalization + softmax reductions run in
        # f32 (cast back to bf16 so the matmuls stay on the bf16 MXU
        # path); the fused Pallas kernels are bf16-internal, so they drop
        # out with it.
        g_model = g_model.clone(f32_stats=True, use_pallas=False,
                                fused_mlp=False)
        d_model = d_model.clone(f32_stats=True, use_pallas=False,
                                fused_mlp=False)
        fused_critic = False
    # gp_f32: the interpolants are cast to f32 BEFORE differentiation
    # (losses.gradient_penalty cast_dtype), so the input gradients come
    # back f32 — no bf16 rounding anywhere in the GP chain
    gp_cast = jnp.float32 if (gp_f32 and compute_dtype != jnp.float32) \
        else None
    if share_fake == "auto":
        share_fake = getattr(g_model, "dropout", 0.0) == 0.0
    elif share_fake and getattr(g_model, "dropout", 0.0) > 0.0:
        # The reference's second G forward redraws dropout masks
        # (loss.py:80); sharing the linearization would silently change
        # training semantics, so refuse the explicit combination.
        raise ValueError(
            "share_fake=True with generator dropout > 0 changes training "
            "semantics (the reference redraws dropout masks on the G-step "
            "forward). Use share_fake='auto' or set dropout=0.")

    def g_apply(params, rng, e, n):
        return g_model.apply(params, e, n, deterministic=False,
                             rngs={"dropout": rng})

    def d_apply(params, rng, e, n):
        return d_model.apply(params, e, n, deterministic=False,
                             rngs={"dropout": rng})

    if fused_critic:
        # fused_critic=True -> fused edge-tail kernel; "block" -> the v5
        # megablock kernel (whole edge stream per block, ops/fused_block.py)
        d_model_first = d_model.clone(
            fused_mlp="block" if fused_critic == "block" else True)

        def d_apply_first(params, rng, e, n):
            return d_model_first.apply(params, e, n, deterministic=False,
                                       rngs={"dropout": rng})

        # revrev: the GP pass is double-differentiated, so it stays on the
        # plain XLA critic.  A higher-order-capable fused variant exists
        # (fused_mlp="jvp": Pallas forward, jnp-math derivatives —
        # ops/fused_mlp.py) and is numerically exact in the
        # double-backward, but measured 6% SLOWER there: the custom_jvp
        # boundary blocks XLA from fusing the GP forward into its two
        # backward passes (PERF.md).
        #
        # fwdrev: the GP *inner input-gradient* pass is plain first-order
        # reverse AD (losses.py gradient_penalty_fwdrev stop-gradients it),
        # so it CAN run the fused kernels; only the JVP term needs forward
        # mode and stays on plain XLA (custom_vjp has no JVP rule).
        if gp_mode == "fwdrev":
            d_apply_gp = d_apply_first
        else:
            d_apply_gp = d_apply
    else:
        d_apply_first = d_apply
        d_apply_gp = d_apply

    if gp_f32 and compute_dtype != jnp.float32:
        # Run the gradient-penalty pass (critic forward, input gradient,
        # and its second-order backward) in f32: the bf16 double-backward
        # produced persistent NaNs once critic weights grew (~step 50k and
        # again ~66k of the reference-scale run, PERF.md round 4), freezing
        # D behind the non-finite guard.  The GP pass is one small critic
        # fwd+bwd per step — the f32 upgrade costs a few percent and
        # matches the reference's own (all-f32) numerics on exactly the
        # numerically sensitive term.  In revrev mode the interpolants are
        # cast f32 before differentiation (gp_cast above), so the chain is
        # f32 end-to-end; in fwdrev mode the cast happens at this apply
        # boundary and the returned input-gradient passes through one bf16
        # rounding.  Takes precedence over the fused-critic fwdrev routing
        # (Pallas kernels are bf16-tiled).
        d_model_gp32 = d_model.clone(dtype=None)

        def d_apply_gp(params, rng, e, n):  # noqa: F811
            return d_model_gp32.apply(params, e.astype(jnp.float32),
                                      n.astype(jnp.float32),
                                      deterministic=False,
                                      rngs={"dropout": rng})

    def step_fn(state: GANState, key, x_labels, a_labels,
                drug_x_labels, drug_a_labels):
        step_key = jax.random.fold_in(key, state.step)
        k_gp, k_gdrop, k_ddrop, k_gdrop2, k_ddrop2 = jax.random.split(step_key, 5)

        if node_mode == "dense":
            x = x_labels.astype(compute_dtype)
        else:
            x = jax.nn.one_hot(x_labels, m_dim, dtype=compute_dtype)
        a = jax.nn.one_hot(a_labels, b_dim, dtype=compute_dtype)
        if submodel == "NoTarget":
            disc_x, disc_a = x, a
        else:
            if node_mode == "dense":
                disc_x = drug_x_labels.astype(compute_dtype)
            else:
                disc_x = jax.nn.one_hot(drug_x_labels, m_dim,
                                        dtype=compute_dtype)
            disc_a = jax.nn.one_hot(drug_a_labels, b_dim, dtype=compute_dtype)

        if share_fake:
            # single G forward; vjp keeps the linearization for the G step
            (node_logits, edge_logits), g_vjp = jax.vjp(
                lambda p: g_apply(p, k_gdrop, a, x)[2:4], state.g_params)
            shared_outs = (None, None, node_logits, edge_logits)
            generator_for_d = lambda _e, _n: shared_outs  # noqa: E731
        else:
            generator_for_d = partial(g_apply, state.g_params, k_gdrop)

        # ---- D update (reference train.py:352-368)
        def d_loss_fn(d_params):
            critic = partial(d_apply_first, d_params, k_ddrop)
            if gp_mode == "fwdrev":
                # the inner input-gradient pass contributes NO parameter
                # tangent (losses.py stop-gradients its result), so hand
                # it stop-gradiented params: the outer linearization then
                # treats the whole block as constant, which both lets the
                # first-order fused kernels run inside it and removes it
                # from the backward graph.  The JVP term keeps live params.
                critic_gp = partial(d_apply_gp,
                                    jax.lax.stop_gradient(d_params), k_ddrop)
            else:
                critic_gp = partial(d_apply_gp, d_params, k_ddrop)
            critic_jvp = partial(d_apply, d_params, k_ddrop)
            return discriminator_loss(generator_for_d, critic, disc_a,
                                      disc_x, a, x, lambda_gp, k_gp, gp_mode,
                                      critic_gp, critic_jvp,
                                      gp_cast=gp_cast)

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
        d_updates, d_opt_state = d_opt.update(d_grads, state.d_opt_state,
                                              state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # ---- G update against the updated critic (reference train.py:370-384)
        if share_fake:
            def g_from_logits(n_logits, e_logits):
                critic = partial(d_apply_first, d_params, k_ddrop2)
                return -jnp.mean(critic(e_logits, n_logits))

            g_loss, cts = jax.value_and_grad(g_from_logits, argnums=(0, 1))(
                node_logits, edge_logits)
            (g_grads,) = g_vjp(cts)
        else:
            def g_loss_fn(g_params):
                critic = partial(d_apply_first, d_params, k_ddrop2)
                generator = partial(g_apply, g_params, k_gdrop2)
                return generator_loss(generator, critic, a, x)

            (g_loss, outs), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(state.g_params)
            _, _, node_logits, edge_logits = outs
        g_updates, g_opt_state = g_opt.update(g_grads, state.g_opt_state,
                                              state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        new_state = GANState(g_params, d_params, g_opt_state, d_opt_state,
                             state.step + 1)
        metrics = {"d_loss": d_loss, "g_loss": g_loss}
        return new_state, metrics, (node_logits, edge_logits)

    donate_argnums = (0,) if donate else ()
    return jax.jit(step_fn, donate_argnums=donate_argnums)


def make_split_train_step(g_model, d_model, g_opt, d_opt, *,
                          lambda_gp: float, m_dim: int, b_dim: int,
                          submodel: str = "DrugGEN",
                          compute_dtype=jnp.float32,
                          node_mode: str = "labels",
                          gp_mode: str = "revrev",
                          fused_critic: bool = False,
                          gp_f32: bool = False, f32_stats: bool = False):
    """The single-jit iteration split into TWO compiled programs (D update
    incl. the GP double-backward; then G update) with the same
    step(state, key, x, a, dx, da) contract.

    Rationale: the relay's remote compiler rejects very large programs
    (deep unrolled configs, PERF.md "Deep-configuration status"); halving
    the program gets deeper stacks through.  Costs one extra host dispatch
    per iteration and re-runs the G forward in the G program (exactly the
    reference's own structure, train.py:352-384; `share_fake` cannot span
    programs).  Opt-in via --split_step."""

    if f32_stats and compute_dtype != jnp.float32:
        # tier-2 numerics (see make_train_step)
        g_model = g_model.clone(f32_stats=True, use_pallas=False,
                                fused_mlp=False)
        d_model = d_model.clone(f32_stats=True, use_pallas=False,
                                fused_mlp=False)
        fused_critic = False
    gp_cast = jnp.float32 if (gp_f32 and compute_dtype != jnp.float32) \
        else None

    def g_apply(params, rng, e, n):
        return g_model.apply(params, e, n, deterministic=False,
                             rngs={"dropout": rng})

    if fused_critic:
        d_model_first = d_model.clone(
            fused_mlp="block" if fused_critic == "block" else True)
    else:
        d_model_first = d_model

    def d_apply_first(params, rng, e, n):
        return d_model_first.apply(params, e, n, deterministic=False,
                                   rngs={"dropout": rng})

    if gp_f32 and compute_dtype != jnp.float32:
        d_model_gp32 = d_model.clone(dtype=None)

        def d_apply_gp(params, rng, e, n):
            # f32 GP pass (see make_train_step)
            return d_model_gp32.apply(params, e.astype(jnp.float32),
                                      n.astype(jnp.float32),
                                      deterministic=False,
                                      rngs={"dropout": rng})
    else:
        def d_apply_gp(params, rng, e, n):
            return d_model.apply(params, e, n, deterministic=False,
                                 rngs={"dropout": rng})

    def _one_hot_inputs(x_labels, a_labels, drug_x_labels, drug_a_labels):
        if node_mode == "dense":
            x = x_labels.astype(compute_dtype)
        else:
            x = jax.nn.one_hot(x_labels, m_dim, dtype=compute_dtype)
        a = jax.nn.one_hot(a_labels, b_dim, dtype=compute_dtype)
        if submodel == "NoTarget":
            return x, a, x, a
        if node_mode == "dense":
            disc_x = drug_x_labels.astype(compute_dtype)
        else:
            disc_x = jax.nn.one_hot(drug_x_labels, m_dim,
                                    dtype=compute_dtype)
        disc_a = jax.nn.one_hot(drug_a_labels, b_dim, dtype=compute_dtype)
        return x, a, disc_x, disc_a

    @jax.jit
    def d_step(state: GANState, key, x_labels, a_labels,
               drug_x_labels, drug_a_labels):
        step_key = jax.random.fold_in(key, state.step)
        k_gp, k_gdrop, k_ddrop, _, _ = jax.random.split(step_key, 5)
        x, a, disc_x, disc_a = _one_hot_inputs(
            x_labels, a_labels, drug_x_labels, drug_a_labels)
        generator_for_d = partial(g_apply, state.g_params, k_gdrop)

        def d_loss_fn(d_params):
            critic = partial(d_apply_first, d_params, k_ddrop)
            critic_gp = partial(d_apply_gp, d_params, k_ddrop)
            return discriminator_loss(generator_for_d, critic, disc_a,
                                      disc_x, a, x, lambda_gp, k_gp,
                                      gp_mode, critic_gp, gp_cast=gp_cast)

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
        d_updates, d_opt_state = d_opt.update(d_grads, state.d_opt_state,
                                              state.d_params)
        return (optax.apply_updates(state.d_params, d_updates),
                d_opt_state, d_loss)

    @jax.jit
    def g_step(state: GANState, key, x_labels, a_labels):
        step_key = jax.random.fold_in(key, state.step)
        _, _, _, k_gdrop2, k_ddrop2 = jax.random.split(step_key, 5)
        if node_mode == "dense":
            x = x_labels.astype(compute_dtype)
        else:
            x = jax.nn.one_hot(x_labels, m_dim, dtype=compute_dtype)
        a = jax.nn.one_hot(a_labels, b_dim, dtype=compute_dtype)

        def g_loss_fn(g_params):
            critic = partial(d_apply_first, state.d_params, k_ddrop2)
            generator = partial(g_apply, g_params, k_gdrop2)
            return generator_loss(generator, critic, a, x)

        (g_loss, outs), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g_params)
        _, _, node_logits, edge_logits = outs
        g_updates, g_opt_state = g_opt.update(g_grads, state.g_opt_state,
                                              state.g_params)
        return (optax.apply_updates(state.g_params, g_updates),
                g_opt_state, g_loss, node_logits, edge_logits)

    def step_fn(state: GANState, key, x_labels, a_labels,
                drug_x_labels, drug_a_labels):
        d_params, d_opt_state, d_loss = d_step(
            state, key, x_labels, a_labels, drug_x_labels, drug_a_labels)
        mid = state._replace(d_params=d_params, d_opt_state=d_opt_state)
        g_params, g_opt_state, g_loss, node_logits, edge_logits = g_step(
            mid, key, x_labels, a_labels)
        new_state = GANState(g_params, d_params, g_opt_state, d_opt_state,
                             state.step + 1)
        return (new_state, {"d_loss": d_loss, "g_loss": g_loss},
                (node_logits, edge_logits))

    return step_fn


def make_multi_step(g_model, d_model, g_opt, d_opt, *, lambda_gp: float,
                    m_dim: int, b_dim: int, submodel: str = "DrugGEN",
                    compute_dtype=jnp.float32, donate: bool = True,
                    node_mode: str = "labels", gp_mode: str = "revrev",
                    share_fake="auto", fused_critic: bool = False,
                    gp_f32: bool = False, f32_stats: bool = False):
    """K steps per dispatch via ``lax.scan`` — zero Python in the hot loop.

    multi_step(state, key, x [K,B,N], a [K,B,N,N], drug_x, drug_a)
      -> (new_state, metrics dict of [K] arrays, last (node, edge) logits).

    The single-step ``make_train_step`` already fuses a whole iteration;
    this removes the remaining per-step host dispatch (which costs tens of
    ms through remote-attached TPUs) by scanning over a stacked batch
    block.  K is static (recompiles per distinct K)."""
    inner = make_train_step(g_model, d_model, g_opt, d_opt,
                            lambda_gp=lambda_gp, m_dim=m_dim, b_dim=b_dim,
                            submodel=submodel, compute_dtype=compute_dtype,
                            donate=False, node_mode=node_mode,
                            gp_mode=gp_mode, share_fake=share_fake,
                            fused_critic=fused_critic, gp_f32=gp_f32,
                            f32_stats=f32_stats)
    # reuse the *unjitted* semantics by calling through the jitted fn inside
    # scan is fine: jit-of-jit inlines.

    def multi_fn(state, key, xs, as_, dxs, das):
        def body(st, batch):
            x, a, dx, da = batch
            st, metrics, outs = inner(st, key, x, a, dx, da)
            return st, (metrics, outs)

        state, (metrics, outs) = jax.lax.scan(
            body, state, (xs, as_, dxs, das))
        last_outs = jax.tree_util.tree_map(lambda o: o[-1], outs)
        return state, metrics, last_outs

    donate_argnums = (0,) if donate else ()
    return jax.jit(multi_fn, donate_argnums=donate_argnums)
