"""Neural SMILES corrector: sequence-to-sequence transformer.

Re-implements the capability of the reference's adapted SMILES-corrector
(``src/util/smiles_cor.py:575-882``: 3-layer encoder/decoder transformer,
hidden 256, 8 heads, feed-forward 512, max length 202, greedy decode) as a
flax model with a ``lax.scan`` greedy decoder — fully jittable, no Python
in the decode loop.

The reference loads pretrained ``PAPYRUS_200`` weights from Google Drive
(``setup.sh``); offline we train our own on synthetic corruption pairs
(see :func:`corruption_pairs` and ``scripts/train_corrector.py``).

Tokenizer regex follows the standard SMILES atom-wise tokenization
(reference ``smi_tokenizer``, smiles_cor.py:895-912).
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import serialization

_TOKEN_RE = re.compile(
    r"(\[[^\]]+\]|Br|Cl|se|as|[BCNOSPFI]|[bcnops]|\(|\)|\.|=|#|-|\+|\\|/|:"
    r"|@@?|\?|>|\*|\$|%[0-9]{2}|[0-9])")

PAD, SOS, EOS, UNK = 0, 1, 2, 3
_SPECIALS = ["<pad>", "<sos>", "<eos>", "<unk>"]


def tokenize(smiles: str) -> list[str]:
    return [t for t in _TOKEN_RE.findall(smiles)]


@dataclass
class Tokenizer:
    vocab: dict[str, int] = field(default_factory=dict)

    @classmethod
    def build(cls, smiles_iter) -> "Tokenizer":
        toks: set[str] = set()
        for s in smiles_iter:
            toks.update(tokenize(s))
        vocab = {t: i for i, t in enumerate(_SPECIALS + sorted(toks))}
        return cls(vocab)

    @property
    def size(self) -> int:
        return len(self.vocab)

    def encode(self, smiles: str, max_len: int) -> np.ndarray:
        ids = [SOS] + [self.vocab.get(t, UNK) for t in tokenize(smiles)][
            : max_len - 2] + [EOS]
        out = np.full(max_len, PAD, dtype=np.int32)
        out[: len(ids)] = ids
        return out

    def decode(self, ids) -> str:
        inv = {i: t for t, i in self.vocab.items()}
        out = []
        for i in np.asarray(ids).tolist():
            if i == EOS:
                break
            if i in (PAD, SOS):
                continue
            out.append(inv.get(int(i), ""))
        return "".join(out)

    def to_json(self) -> str:
        return json.dumps(self.vocab)

    @classmethod
    def from_json(cls, s: str) -> "Tokenizer":
        return cls(json.loads(s))


# ---------------------------------------------------------------- model

class TransformerLayer(nn.Module):
    hid: int
    heads: int
    pf: int
    causal: bool = False
    cross: bool = False

    @nn.compact
    def __call__(self, x, mask, ctx=None, ctx_mask=None):
        h = nn.LayerNorm()(x)
        attn_mask = mask[:, None, None, :]
        if self.causal:
            L = x.shape[1]
            causal = jnp.tril(jnp.ones((L, L), bool))
            attn_mask = attn_mask & causal[None, None, :, :]
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.hid)(h, h, mask=attn_mask)
        x = x + h
        if self.cross:
            h = nn.LayerNorm()(x)
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.heads, qkv_features=self.hid)(
                    h, nn.LayerNorm()(ctx),
                    mask=ctx_mask[:, None, None, :])
            x = x + h
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.pf)(h)
        h = nn.relu(h)
        h = nn.Dense(self.hid)(h)
        return x + h


class Seq2Seq(nn.Module):
    """Encoder-decoder over token ids; reference topology
    (smiles_cor.py:931-1120: enc/dec layers 3, hid 256, heads 8, pf 512,
    max_len 202)."""

    vocab_size: int
    hid: int = 256
    heads: int = 8
    pf: int = 512
    n_layers: int = 3
    max_len: int = 202

    def setup(self):
        self.tok_emb = nn.Embed(self.vocab_size, self.hid)
        self.pos_emb = nn.Embed(self.max_len, self.hid)
        self.enc_layers = [TransformerLayer(self.hid, self.heads, self.pf)
                           for _ in range(self.n_layers)]
        self.dec_layers = [TransformerLayer(self.hid, self.heads, self.pf,
                                            causal=True, cross=True)
                           for _ in range(self.n_layers)]
        self.out = nn.Dense(self.vocab_size)
        self.final_ln = nn.LayerNorm()

    def encode(self, src):
        mask = src != PAD
        pos = jnp.arange(src.shape[1])[None, :]
        x = self.tok_emb(src) + self.pos_emb(pos)
        for layer in self.enc_layers:
            x = layer(x, mask)
        return x, mask

    def decode_logits(self, tgt, ctx, ctx_mask):
        mask = tgt != PAD
        pos = jnp.arange(tgt.shape[1])[None, :]
        x = self.tok_emb(tgt) + self.pos_emb(pos)
        for layer in self.dec_layers:
            x = layer(x, mask, ctx, ctx_mask)
        return self.out(self.final_ln(x))

    def __call__(self, src, tgt):
        ctx, ctx_mask = self.encode(src)
        return self.decode_logits(tgt, ctx, ctx_mask)


def greedy_decode(model: Seq2Seq, params, src, max_len: int | None = None):
    """Batched greedy decoding via lax.scan (reference's 202-step loop,
    smiles_cor.py:864-882, but compiled)."""
    max_len = max_len or model.max_len

    def apply_encode(src):
        return model.apply(params, src, method=Seq2Seq.encode)

    ctx, ctx_mask = apply_encode(src)
    b = src.shape[0]
    tgt0 = jnp.full((b, max_len), PAD, jnp.int32).at[:, 0].set(SOS)

    def step(carry, t):
        tgt, done = carry
        logits = model.apply(params, tgt, ctx, ctx_mask,
                             method=Seq2Seq.decode_logits)
        nxt = jnp.argmax(logits[:, t, :], axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, PAD, nxt)
        tgt = tgt.at[:, t + 1].set(nxt)
        done = done | (nxt == EOS)
        return (tgt, done), None

    (tgt, _), _ = jax.lax.scan(step, (tgt0, jnp.zeros(b, bool)),
                               jnp.arange(max_len - 1))
    return tgt


# ---------------------------------------------------------------- wrapper

class Seq2SeqCorrector:
    """Checkpointable corrector with the reference's translate contract
    (``correct_SMILES``, smiles_cor.py:1180-1215)."""

    def __init__(self, model: Seq2Seq, params, tokenizer: Tokenizer):
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self._decode = jax.jit(
            lambda params, src: greedy_decode(model, params, src))

    def translate(self, smiles: str) -> str:
        src = self.tokenizer.encode(smiles, self.model.max_len)[None, :]
        out = self._decode(self.params, jnp.asarray(src))
        return self.tokenizer.decode(np.asarray(out)[0])

    def translate_batch(self, smiles_list: list[str]) -> list[str]:
        src = np.stack([self.tokenizer.encode(s, self.model.max_len)
                        for s in smiles_list])
        out = np.asarray(self._decode(self.params, jnp.asarray(src)))
        return [self.tokenizer.decode(row) for row in out]

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        meta = {"vocab_size": self.model.vocab_size, "hid": self.model.hid,
                "heads": self.model.heads, "pf": self.model.pf,
                "n_layers": self.model.n_layers,
                "max_len": self.model.max_len}
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)
        with open(os.path.join(path, "tokenizer.json"), "w") as f:
            f.write(self.tokenizer.to_json())
        with open(os.path.join(path, "params.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(self.params)))

    @classmethod
    def load(cls, path: str) -> "Seq2SeqCorrector":
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        with open(os.path.join(path, "tokenizer.json")) as f:
            tokenizer = Tokenizer.from_json(f.read())
        model = Seq2Seq(**meta)
        template = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, meta["max_len"]), jnp.int32),
            jnp.zeros((1, meta["max_len"]), jnp.int32))
        with open(os.path.join(path, "params.msgpack"), "rb") as f:
            params = serialization.from_bytes(template, f.read())
        return cls(model, params, tokenizer)


# ---------------------------------------------------------------- training

def corruption_pairs(smiles_list, rng: np.random.Generator,
                     n_per_mol: int = 2) -> list[tuple[str, str]]:
    """(corrupted, correct) pairs by random token edits — the offline
    substitute for the reference's pretraining corpus."""
    ops = ("delete", "duplicate", "swap", "replace")
    alphabet = ["C", "c", "N", "n", "O", "o", "(", ")", "1", "2", "=", "#"]
    pairs = []
    for s in smiles_list:
        toks = tokenize(s)
        if len(toks) < 3:
            continue
        for _ in range(n_per_mol):
            t = list(toks)
            for _ in range(rng.integers(1, 3)):
                op = ops[rng.integers(0, len(ops))]
                i = int(rng.integers(0, len(t)))
                if op == "delete" and len(t) > 2:
                    del t[i]
                elif op == "duplicate":
                    t.insert(i, t[i])
                elif op == "swap" and i + 1 < len(t):
                    t[i], t[i + 1] = t[i + 1], t[i]
                elif op == "replace":
                    t[i] = alphabet[rng.integers(0, len(alphabet))]
            pairs.append(("".join(t), s))
    return pairs


def _repair_to_valid(mol):
    """Minimal-intervention repair of a failed decode, for use as a
    correction TARGET: (1) the reference's valence repair (bond removal,
    dataset.py:251-277), then (2) demote aromatic bonds outside rings to
    single (the generator's dominant aromatic failure mode), then (3) as a
    last resort fully de-aromatize.  Returns a sanitized Mol or None."""
    from druggen_tpu.chem.codec import correct_mol
    from druggen_tpu.chem.mol import BondType

    def _try(m):
        try:
            m.sanitize()
            return True
        except Exception:
            return False

    def _reset(m):
        m._adj = None
        m._kekule_double = None
        m.sanitized = False

    mol = correct_mol(mol, max_steps=4 * len(mol.bonds) + 50)
    if _try(mol):
        return mol
    ring_bonds = {frozenset((r[i], r[(i + 1) % len(r)]))
                  for r in mol.ring_info() for i in range(len(r))}
    for b in mol.bonds:
        if (b.type == BondType.AROMATIC
                and frozenset((b.a1, b.a2)) not in ring_bonds):
            b.type = BondType.SINGLE
    _reset(mol)
    if _try(mol):
        return mol
    for b in mol.bonds:
        if b.type == BondType.AROMATIC:
            b.type = BondType.SINGLE
    for a in mol.atoms:
        a.aromatic = False
    _reset(mol)
    mol = correct_mol(mol, max_steps=4 * len(mol.bonds) + 50)
    return mol if _try(mol) else None


def generator_failure_pairs(node_labels, edge_labels, vocab,
                            max_pairs: int | None = None,
                            max_src_tokens: int = 200
                            ) -> list[tuple[str, str]]:
    """(invalid_raw_smiles, repaired_valid_smiles) pairs from *actual*
    generator outputs.

    The reference's corrector is applied to the raw SMILES the generator
    writes at inference (inference.py:233, smiles_cor.py:1180-1215).  To
    train on the same failure distribution, take argmax label matrices
    whose strict decode fails, write the unsanitized molecule as a (by
    construction invalid) SMILES string, and use the valence-repaired
    decode (reference correct_mol semantics, dataset.py:251-277) as the
    ground-truth correction target."""
    from druggen_tpu.chem.canon import mol_to_smiles
    from druggen_tpu.chem.codec import (
        matrices_to_mol,
        strip_to_largest_fragment,
    )
    from druggen_tpu.chem.smiles import mol_from_smiles

    pairs: list[tuple[str, str]] = []
    seen: set[str] = set()
    for x_l, a_l in zip(node_labels, edge_labels):
        if matrices_to_mol(x_l, a_l, vocab, strict=True) is not None:
            continue                      # decodes fine; nothing to learn
        raw = matrices_to_mol(x_l, a_l, vocab, strict=False)
        if raw is None:
            continue
        try:
            src = strip_to_largest_fragment(mol_to_smiles(raw,
                                                          canonical=False))
        except Exception:
            continue
        if not src or src in seen:
            continue
        # a seq2seq with max_len ~202 can't learn from fully-dense garbage
        # graphs whose SMILES blow the context — skip monsters (the
        # reference's corrector likewise sees only inference-written
        # near-valid strings, smiles_cor.py:1180-1215)
        if len(tokenize(src)) > max_src_tokens:
            continue
        repaired = _repair_to_valid(matrices_to_mol(x_l, a_l, vocab,
                                                    strict=False))
        if repaired is None:
            continue
        try:
            tgt = strip_to_largest_fragment(mol_to_smiles(repaired))
        except Exception:
            continue
        m = mol_from_smiles(tgt)
        if m is None or not tgt:
            continue
        try:
            m.sanitize()
        except Exception:
            continue
        seen.add(src)
        pairs.append((src, tgt))
        if max_pairs and len(pairs) >= max_pairs:
            break
    return pairs


def train_corrector(smiles_list, *, steps: int = 500, batch: int = 32,
                    lr: float = 3e-4, hid: int = 256, heads: int = 8,
                    pf: int = 512, n_layers: int = 3, max_len: int = 202,
                    seed: int = 0, log_every: int = 100,
                    extra_pairs: list[tuple[str, str]] | None = None
                    ) -> Seq2SeqCorrector:
    """Train on corruption pairs: synthetic token edits over
    ``smiles_list`` plus optional ``extra_pairs`` (e.g. real
    generator-failure pairs from :func:`generator_failure_pairs`)."""
    import optax

    rng = np.random.default_rng(seed)
    pair_sources = list(extra_pairs or [])
    tokenizer = Tokenizer.build(
        smiles_list + [s for p in pair_sources for s in p])
    pairs = corruption_pairs(smiles_list, rng) + pair_sources
    src = np.stack([tokenizer.encode(c, max_len) for c, _ in pairs])
    tgt = np.stack([tokenizer.encode(g, max_len) for _, g in pairs])

    model = Seq2Seq(vocab_size=tokenizer.size, hid=hid, heads=heads, pf=pf,
                    n_layers=n_layers, max_len=max_len)
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.asarray(src[:1]), jnp.asarray(tgt[:1]))
    opt = optax.adamw(lr)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, src_b, tgt_b):
        def loss_fn(p):
            logits = model.apply(p, src_b, tgt_b)
            # predict token t+1 from prefix ..t
            labels = tgt_b[:, 1:]
            lg = logits[:, :-1]
            mask = labels != PAD
            ll = optax.softmax_cross_entropy_with_integer_labels(lg, labels)
            return (ll * mask).sum() / jnp.maximum(mask.sum(), 1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    n = len(src)
    for step in range(steps):
        idx = rng.integers(0, n, size=batch)
        params, opt_state, loss = train_step(
            params, opt_state, jnp.asarray(src[idx]), jnp.asarray(tgt[idx]))
        if log_every and step % log_every == 0:
            print(f"corrector step {step}: loss {float(loss):.4f}")
        elif step % 10 == 9:
            # hard sync: through the remote-TPU relay, queueing more than
            # ~20 dispatches between value fetches stalls (PERF.md)
            float(loss)
    return Seq2SeqCorrector(model, params, tokenizer)
