"""WGAN-GP objectives.

Functional re-implementation of the reference losses
(``src/model/loss.py``):

- :func:`gradient_penalty` — eps-interpolation on both node and edge inputs,
  per-sample input gradients of the critic, concatenated 2-norm, mean
  squared deviation from 1 (``loss.py:4-49``).  In JAX the reference's
  ``torch.autograd.grad(..., create_graph=True)`` double-backward becomes a
  ``jax.grad`` *inside* the loss that is itself differentiated — natively
  supported (SURVEY.md §3.1).
- :func:`discriminator_loss` — ``E[D(fake)] - E[D(real)] + λ·GP`` with the
  generator outputs stop-gradiented (``loss.py:52-72``; the reference's
  ``.detach()``).
- :func:`generator_loss` — ``-E[D(fake)]`` (``loss.py:75-85``).

Critic gradient trick: D outputs [B, 1] with per-sample independence, so
``jax.grad`` of ``sum(D(x))`` w.r.t. the input gives exactly the per-sample
gradients the reference obtains with ``grad_outputs=ones``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

# Critic signature: (edge [B,N,N,b], node [B,N,m]) -> [B,1]
CriticFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]
# Generator signature: (edge, node) -> (node_h, edge_h, node_logits, edge_logits)
GeneratorFn = Callable[[jnp.ndarray, jnp.ndarray], tuple]


def gradient_penalty(critic: CriticFn,
                     real_node: jnp.ndarray, real_edge: jnp.ndarray,
                     fake_node: jnp.ndarray, fake_edge: jnp.ndarray,
                     key: jax.Array, cast_dtype=None) -> jnp.ndarray:
    """Reference ``gradient_penalty`` (loss.py:4-49).

    ``cast_dtype``: cast the interpolation points to this dtype *before*
    differentiation (the gp_f32 escalation path): ``jax.grad`` then returns
    the input gradients in that dtype, so the whole
    interpolant -> critic -> gradient -> norm chain is f32 with no bf16
    rounding of the gradient values (the interpolants themselves are bf16
    values, exactly representable in f32)."""
    b = real_node.shape[0]
    k_node, k_edge = jax.random.split(key)
    eps_node = jax.random.uniform(k_node, (b, 1, 1), real_node.dtype)
    eps_edge = jax.random.uniform(k_edge, (b, 1, 1, 1), real_edge.dtype)

    int_node = eps_node * real_node + (1.0 - eps_node) * fake_node
    int_edge = eps_edge * real_edge + (1.0 - eps_edge) * fake_edge
    if cast_dtype is not None:
        int_node = int_node.astype(cast_dtype)
        int_edge = int_edge.astype(cast_dtype)

    def critic_sum(node, edge):
        return jnp.sum(critic(edge, node))

    g_node, g_edge = jax.grad(critic_sum, argnums=(0, 1))(int_node, int_edge)
    # norm/penalty reduction in f32 regardless of compute dtype (no-op at
    # f32; under bf16 the squared-sum/sqrt chain is the numerically
    # sensitive part of the whole step — see PERF.md round 4 NaN incident)
    grads = jnp.concatenate([g_node.reshape(b, -1), g_edge.reshape(b, -1)],
                            axis=1).astype(jnp.float32)
    norms = jnp.sqrt(jnp.sum(grads * grads, axis=1) + 1e-12)
    return jnp.mean((norms - 1.0) ** 2)


def gradient_penalty_fwdrev(critic: CriticFn,
                            real_node: jnp.ndarray, real_edge: jnp.ndarray,
                            fake_node: jnp.ndarray, fake_edge: jnp.ndarray,
                            key: jax.Array,
                            critic_jvp: CriticFn | None = None) -> jnp.ndarray:
    """Same value and parameter-gradient as :func:`gradient_penalty`, but
    restructured as **reverse-over-forward** instead of the reference's
    reverse-over-reverse (``create_graph=True``, loss.py:36).

    Chain rule: with ``g(θ) = ∇ₓ D(x̂;θ)`` and ``GP = f(g)``,
    ``∇θ GP = f'(g)ᵀ ∂g/∂θ = ∇θ [uᵀ g(θ)]`` for ``u = stop_grad(f'(g))``,
    and ``uᵀ∇ₓD`` is the directional derivative of D along u — a JVP.
    So the inner input-gradient pass is **not differentiated** (its
    backward graph can use first-order fused kernels), and the only thing
    the outer ``jax.grad`` sees is a JVP of the critic.  The exact GP
    *value* is spliced back in with the usual surrogate identity
    ``s - sg(s) + sg(GP)``.

    Mathematically identical gradients (tests/test_train_step.py checks
    allclose vs the rev-rev path); a throughput/memory knob on TPU where
    the step is HBM-bandwidth-bound.

    ``critic_jvp``: critic used for the JVP term only (defaults to
    ``critic``).  The inner input-gradient pass is plain first-order
    reverse AD and is never differentiated again, so ``critic`` may use
    first-order fused kernels (``custom_vjp``); the JVP pass is
    forward-differentiated and then transposed by the outer grad, so
    ``critic_jvp`` must support forward mode (plain XLA, or the
    ``custom_jvp`` kernel variant)."""
    b = real_node.shape[0]
    k_node, k_edge = jax.random.split(key)
    eps_node = jax.random.uniform(k_node, (b, 1, 1), real_node.dtype)
    eps_edge = jax.random.uniform(k_edge, (b, 1, 1, 1), real_edge.dtype)

    int_node = eps_node * real_node + (1.0 - eps_node) * fake_node
    int_edge = eps_edge * real_edge + (1.0 - eps_edge) * fake_edge
    # the interpolation points are constants of the penalty (the reference
    # differentiates at fixed x̂ too)
    int_node = jax.lax.stop_gradient(int_node)
    int_edge = jax.lax.stop_gradient(int_edge)

    def critic_sum(node, edge):
        return jnp.sum(critic(edge, node))

    # ---- first-order inner pass: g = ∇ₓ D(x̂), NOT differentiated further
    g_node, g_edge = jax.grad(critic_sum, argnums=(0, 1))(int_node, int_edge)
    g_node = jax.lax.stop_gradient(g_node)
    g_edge = jax.lax.stop_gradient(g_edge)
    # f32 reduction (see gradient_penalty)
    sq = (jnp.sum(g_node.reshape(b, -1).astype(jnp.float32) ** 2, axis=1)
          + jnp.sum(g_edge.reshape(b, -1).astype(jnp.float32) ** 2, axis=1))
    norms = jnp.sqrt(sq + 1e-12)
    gp_value = jnp.mean((norms - 1.0) ** 2)

    # u = f'(g): d/dg of mean_b((‖g_b‖-1)²) = 2(‖g_b‖-1)/(B·‖g_b‖) · g_b
    coef = (2.0 * (norms - 1.0) / (b * norms))
    u_node = coef[:, None, None] * g_node
    u_edge = coef[:, None, None, None] * g_edge
    u_node = u_node.astype(int_node.dtype)
    u_edge = u_edge.astype(int_edge.dtype)

    # s(θ) = uᵀ∇ₓD(x̂;θ) as a JVP; outer grad(θ) sees reverse-over-forward
    def critic_jvp_sum(node, edge):
        return jnp.sum((critic_jvp or critic)(edge, node))

    _, s = jax.jvp(critic_jvp_sum, (int_node, int_edge), (u_node, u_edge))
    return s - jax.lax.stop_gradient(s) + jax.lax.stop_gradient(gp_value)


def discriminator_loss(generator: GeneratorFn, critic: CriticFn,
                       drug_edge: jnp.ndarray, drug_node: jnp.ndarray,
                       mol_edge: jnp.ndarray, mol_node: jnp.ndarray,
                       lambda_gp: float, key: jax.Array,
                       gp_mode: str = "revrev",
                       critic_gp: CriticFn | None = None,
                       critic_jvp: CriticFn | None = None,
                       gp_cast=None) -> jnp.ndarray:
    """Reference ``discriminator_loss`` (loss.py:52-72): critic sees the real
    (drug) graphs and the generator's *logit* outputs (continuous
    relaxation, not argmax-discretized), with G frozen.

    ``gp_mode``: "revrev" (reference-style double reverse) or "fwdrev"
    (:func:`gradient_penalty_fwdrev`, same gradients).

    ``critic_gp``: critic used for the gradient-penalty pass (defaults to
    ``critic``).  The real/fake passes are differentiated exactly once, so
    ``critic`` may use first-order-only fused kernels; the GP pass is
    double-differentiated and ``critic_gp`` must be fully twice-
    differentiable (XLA path).  Same parameters, same math — only the
    execution schedule differs.

    ``gp_cast``: dtype the GP interpolants are cast to before
    differentiation (see :func:`gradient_penalty`)."""
    logits_real = critic(drug_edge, drug_node)
    _, _, node_logits, edge_logits = generator(mol_edge, mol_node)
    fake_node = jax.lax.stop_gradient(node_logits)
    fake_edge = jax.lax.stop_gradient(edge_logits)
    logits_fake = critic(fake_edge, fake_node)
    if gp_mode == "fwdrev":
        gp = gradient_penalty_fwdrev(critic_gp or critic, drug_node,
                                     drug_edge, fake_node, fake_edge, key,
                                     critic_jvp=critic_jvp)
    else:
        gp = gradient_penalty(critic_gp or critic, drug_node, drug_edge,
                              fake_node, fake_edge, key, cast_dtype=gp_cast)
    return jnp.mean(logits_fake) - jnp.mean(logits_real) + lambda_gp * gp


def generator_loss(generator: GeneratorFn, critic: CriticFn,
                   mol_edge: jnp.ndarray, mol_node: jnp.ndarray
                   ) -> tuple[jnp.ndarray, tuple]:
    """Reference ``generator_loss`` (loss.py:75-85).  Returns (loss,
    generator outputs) so the caller can reuse the samples for logging."""
    outs = generator(mol_edge, mol_node)
    _, _, node_logits, edge_logits = outs
    logits_fake = critic(edge_logits, node_logits)
    return -jnp.mean(logits_fake), outs
