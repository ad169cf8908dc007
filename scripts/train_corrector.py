#!/usr/bin/env python
"""Train the neural SMILES corrector.

The reference ships pretrained corrector weights (PAPYRUS_200, downloaded
by setup.sh) and applies them to the raw SMILES the generator writes at
inference (reference inference.py:233, smiles_cor.py:1180-1215).  This
script trains our JAX re-implementation on two pair sources:

- synthetic token-edit corruption pairs over a SMILES corpus, and
- **real generator-failure pairs** (--gen-ckpt): argmax outputs of an
  actual (e.g. early-epoch) generator whose strict decode fails, written
  as invalid SMILES, with the valence-repaired decode as the target —
  the same failure distribution the corrector sees in production.

A held-out slice of the failure pairs is used to report the
corrected-fraction and exact-repair metrics (written to <out>/eval.json).

Usage:
    python scripts/train_corrector.py --smiles data/chembl_like_150k.smi \\
        --gen-ckpt experiments/r2_scale/models/1-500-G.ckpt \\
        --gen-samples 8192 --steps 4000 --out experiments/corrector_r2
    # then: export DRUGGEN_CORRECTOR_CKPT=experiments/corrector_r2
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def mine_failure_pairs(args, corpus):
    """Run the generator over real graphs, collect strict-decode failures."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from druggen_tpu.chem.vocab import get_vocab
    from druggen_tpu.data.dataset import featurize_smiles
    from druggen_tpu.infer.seq2seq import generator_failure_pairs
    from druggen_tpu.models import Generator
    from druggen_tpu.train import checkpoint as ckpt

    # the vocab must match the generator checkpoint's training vocab —
    # build it from the same (raw, drug) file pair
    vocab = get_vocab(args.smiles, args.drug_smiles or args.smiles,
                      args.max_atom,
                      cache_dir=os.path.join(os.path.dirname(args.smiles)
                                             or ".", "vocab"))
    n_in = min(args.gen_samples, len(corpus))
    data = featurize_smiles(corpus[:n_in], vocab, args.max_atom)
    G = Generator(act="relu", vertexes=data.x.shape[1], edges=vocab.b_dim,
                  nodes=vocab.m_dim, dropout=0.0, dim=args.gen_dim,
                  depth=args.gen_depth, heads=args.gen_heads,
                  mlp_ratio=args.gen_mlp_ratio)
    template = G.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, data.x.shape[1], data.x.shape[1],
                                 vocab.b_dim)),
                      jnp.zeros((1, data.x.shape[1], vocab.m_dim)))
    params = ckpt.load_params_auto(args.gen_ckpt, template)

    @jax.jit
    def fwd(p, a_labels, x_labels):
        a = jax.nn.one_hot(a_labels, vocab.b_dim)
        x = jax.nn.one_hot(x_labels, vocab.m_dim)
        _, _, nl, el = G.apply(p, a, x)
        return (jnp.argmax(nl, -1).astype(jnp.int32),
                jnp.argmax(el, -1).astype(jnp.int32))

    nodes, edges = [], []
    bs = 256
    for i in range(0, data.x.shape[0] - bs + 1, bs):
        n, e = fwd(params, jnp.asarray(data.a[i:i + bs]),
                   jnp.asarray(data.x[i:i + bs]))
        nodes.append(np.asarray(n))
        edges.append(np.asarray(e))
    nodes = np.concatenate(nodes) if nodes else np.zeros((0, 1))
    edges = np.concatenate(edges) if edges else np.zeros((0, 1, 1))
    pairs = generator_failure_pairs(nodes, edges, vocab)
    print(f"mined {len(pairs)} failure pairs from {len(nodes)} generator "
          f"samples ({len(pairs) / max(len(nodes), 1):.1%} failed strict "
          f"decode with a repairable target)")
    return pairs


def evaluate_corrector(corrector, holdout_pairs):
    """Corrected-fraction, exact-repair rate, and repair FIDELITY — mean
    Tanimoto between each valid corrected molecule and its graph-repair
    target (the corrector's actual job in the reference pipeline,
    smiles_cor.py:1219-1283, is to recover the intended molecule, not just
    *a* valid one)."""
    import numpy as np

    from druggen_tpu.chem.canon import canonical_smiles
    from druggen_tpu.chem.fingerprints import morgan_fingerprint
    from druggen_tpu.chem.smiles import mol_from_smiles

    srcs = [s for s, _ in holdout_pairs]
    tgts = [t for _, t in holdout_pairs]
    outs = corrector.translate_batch(srcs)
    n = len(srcs)
    src_valid = sum(1 for s in srcs if canonical_smiles(s) is not None)
    corrected = sum(1 for o in outs if o and canonical_smiles(o) is not None)
    exact = sum(1 for o, t in zip(outs, tgts)
                if o and canonical_smiles(o) == canonical_smiles(t))
    sims = []
    for o, t in zip(outs, tgts):
        mo = mol_from_smiles(o) if o else None
        mt = mol_from_smiles(t)
        if mo is None or mt is None:
            continue
        fo = morgan_fingerprint(mo).astype(np.float32)
        ft = morgan_fingerprint(mt).astype(np.float32)
        inter = float(fo @ ft)
        union = float(fo.sum() + ft.sum()) - inter
        sims.append(inter / union if union else 0.0)
    return {
        "n_holdout": n,
        "validity_before": src_valid / n if n else 0.0,
        "validity_after": corrected / n if n else 0.0,
        "exact_repair_rate": exact / n if n else 0.0,
        "mean_tanimoto_to_target": (sum(sims) / len(sims)) if sims else 0.0,
        "n_similarity_pairs": len(sims),
    }


def train_reference_corrector(corpus, pairs, *, steps, batch, lr, hid,
                              n_layers, max_len, out_dir, seed=0):
    """Train the reference-exact topology (infer/seq2seq_ref.py) from
    scratch on the same pair data — so the weight-compatible interop model
    is also a performing model (VERDICT r2 weak #6).

    Follows the reference training conventions: torchtext specials order
    (UNK,PAD,SOS,EOS), REVERSED target token sequences
    (smiles_cor.py:959-965), separate src/trg embeddings."""
    import numpy as np
    import optax

    import jax
    import jax.numpy as jnp

    from druggen_tpu.infer.seq2seq import corruption_pairs, tokenize
    from druggen_tpu.infer.seq2seq_ref import (
        EOS,
        PAD,
        SOS,
        UNK,
        forward,
        init_params,
    )
    from druggen_tpu.interop.corrector_ckpt import ReferenceCorrector

    rng = np.random.default_rng(seed)
    all_pairs = corruption_pairs(corpus, rng) + list(pairs)
    # torchtext-order vocab over both sides
    toks = sorted({t for s, g in all_pairs
                   for t in tokenize(s) + tokenize(g)})
    itos = ["<unk>", "<pad>", "<sos>", "<eos>"] + toks
    stoi = {t: i for i, t in enumerate(itos)}
    L = max_len + 2

    def enc(smi, reverse):
        ts = tokenize(smi)[:max_len]
        if reverse:
            ts = ts[::-1]
        ids = [SOS] + [stoi.get(t, UNK) for t in ts] + [EOS]
        row = np.full(L, PAD, np.int32)
        row[:len(ids)] = ids
        return row

    src = np.stack([enc(s, False) for s, _ in all_pairs])
    trg = np.stack([enc(g, True) for _, g in all_pairs])

    params = init_params(seed, len(itos), len(itos), hid=hid,
                         n_layers=n_layers, max_len=max_len)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    opt = optax.adamw(lr)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, src_b, trg_b):
        def loss_fn(p):
            logits = forward(p, src_b, trg_b)
            labels = trg_b[:, 1:]
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
            params, opt_state, jnp.asarray(src[idx]), jnp.asarray(trg[idx]))
        if step % 100 == 0:
            print(f"ref-corrector step {step}: loss {float(loss):.4f}",
                  flush=True)
        elif step % 10 == 9:
            float(loss)       # bound the dispatch queue (PERF.md)

    params = jax.device_get(params)
    os.makedirs(out_dir, exist_ok=True)
    from flax import serialization

    with open(os.path.join(out_dir, "params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(params))
    with open(os.path.join(out_dir, "vocab.json"), "w") as f:
        json.dump({"itos": itos, "hid": hid, "n_layers": n_layers,
                   "max_len": max_len}, f)
    print(f"reference-topology corrector saved to {out_dir}")
    return ReferenceCorrector(jax.tree_util.tree_map(jnp.asarray, params),
                              stoi, itos, max_len=max_len)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--smiles", help=".smi corpus (default: built-in)")
    p.add_argument("--out", default="experiments/corrector")
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--max-len", type=int, default=202)
    p.add_argument("--hid", type=int, default=256)
    p.add_argument("--layers", type=int, default=3)
    p.add_argument("--platform", default=None)
    p.add_argument("--corpus-limit", type=int, default=20000,
                   help="cap on synthetic-pair corpus size")
    # real generator-failure mining
    p.add_argument("--gen-ckpt", default=None,
                   help="path to a generator .ckpt; mines real failure "
                        "pairs from its argmax outputs")
    p.add_argument("--pairs-file", default=None,
                   help="JSON of pre-mined failure pairs "
                        "(scripts/mine_corrector_pairs.py output) — the "
                        "multi-checkpoint, >=10k-pair path; combinable "
                        "with --gen-ckpt")
    p.add_argument("--drug-smiles", default=None,
                   help="drug .smi used when training the generator (the "
                        "vocab is the union of both files)")
    p.add_argument("--gen-samples", type=int, default=8192)
    p.add_argument("--gen-dim", type=int, default=128)
    p.add_argument("--gen-depth", type=int, default=1)
    p.add_argument("--gen-heads", type=int, default=8)
    p.add_argument("--gen-mlp-ratio", type=int, default=3)
    p.add_argument("--max-atom", type=int, default=45)
    p.add_argument("--holdout-frac", type=float, default=0.1)
    p.add_argument("--arch", choices=("native", "reference", "both"),
                   default="native",
                   help="corrector topology to train: the pre-LN native "
                        "redesign, the reference-exact (PAPYRUS_200 weight-"
                        "compatible) topology, or both")
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    if args.smiles:
        from druggen_tpu.chem.vocab import read_smiles_file

        corpus = read_smiles_file(args.smiles)[:args.corpus_limit]
    else:
        from druggen_tpu.data.corpus import (
            DRUGLIKE_SMILES,
            TARGET_SMILES,
            generate_corpus,
        )

        corpus = DRUGLIKE_SMILES + TARGET_SMILES + generate_corpus(400)

    extra_pairs, holdout = [], []
    pairs = []
    if args.pairs_file:
        with open(args.pairs_file) as f:
            d = json.load(f)
        pairs += [tuple(x) for x in (d["pairs"] if isinstance(d, dict)
                                     else d)]
        print(f"loaded {len(pairs)} pre-mined pairs from "
              f"{args.pairs_file}")
    if args.gen_ckpt:
        pairs += mine_failure_pairs(args, corpus)
    if pairs:
        import random as _random

        # deterministic shuffle so the holdout spans all source
        # checkpoints, not just the first-mined ones
        _random.Random(13).shuffle(pairs)
        n_hold = max(1, int(len(pairs) * args.holdout_frac))
        holdout, extra_pairs = pairs[:n_hold], pairs[n_hold:]

    if args.arch in ("native", "both"):
        from druggen_tpu.infer.seq2seq import train_corrector

        corrector = train_corrector(corpus, steps=args.steps,
                                    batch=args.batch,
                                    lr=args.lr, hid=args.hid,
                                    n_layers=args.layers,
                                    max_len=args.max_len,
                                    extra_pairs=extra_pairs)
        corrector.save(args.out)
        print(f"corrector saved to {args.out}")
        if holdout:
            metrics = evaluate_corrector(corrector, holdout)
            print("held-out garbage-set evaluation:", metrics)
            with open(os.path.join(args.out, "eval.json"), "w") as f:
                json.dump(metrics, f, indent=1)

    if args.arch in ("reference", "both"):
        ref_out = os.path.join(args.out, "ref_arch")
        ref = train_reference_corrector(
            corpus, extra_pairs, steps=args.steps, batch=args.batch,
            lr=args.lr, hid=args.hid, n_layers=args.layers,
            max_len=args.max_len, out_dir=ref_out)
        if holdout:
            metrics = evaluate_corrector(ref, holdout)
            print("reference-topology held-out evaluation:", metrics)
            with open(os.path.join(ref_out, "eval.json"), "w") as f:
                json.dump(metrics, f, indent=1)

    if holdout:
        with open(os.path.join(args.out, "holdout_pairs.json"), "w") as f:
            json.dump(holdout, f)
    print("enable with: export DRUGGEN_CORRECTOR_CKPT=" + args.out)


if __name__ == "__main__":
    main()
