#!/usr/bin/env python
"""Mine real generator-failure pairs from MANY checkpoints of a run.

Round-4 trained the SMILES corrector on 1,098 real pairs mined from a
single checkpoint — too few for a trained corrector (round-4 VERDICT
weak #3 / task 7 asked for >=10k pairs mined across many checkpoints).
This tool walks every ``{epoch}-{iter}-G.ckpt`` in a model dir, runs each
generator over real graphs, collects argmax outputs that FAIL strict
decode but have a valid bond-removal repair target (the same
(invalid-SMILES, repaired-SMILES) pair definition as
``druggen_tpu.infer.seq2seq.generator_failure_pairs`` — the reference
corrector's training signal, smiles_cor.py:1180-1283), dedupes by source
string, and writes one JSON file consumable by
``scripts/train_corrector.py --pairs-file``.

Different checkpoints fail differently (early epochs: systematic valence
errors; late epochs: the hard residual tail), so the union is both bigger
and more diverse than any single-checkpoint mine.

CPU-friendly: one jitted forward reused across all checkpoints (same
shapes, one compile).

    python scripts/mine_corrector_pairs.py \
        --model_dir experiments/r4_scale/models/... \
        --smiles data/chembl_frag_1m6.smi --drug_smiles data/akt1_drugs_2607.smi \
        --samples_per_ckpt 4096 --out experiments/corrector_r5/pairs.json
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_dir", required=True)
    p.add_argument("--smiles", required=True, help="real-graph corpus")
    p.add_argument("--drug_smiles", default=None)
    p.add_argument("--samples_per_ckpt", type=int, default=4096)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--max_atom", type=int, default=45)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--depth", type=int, default=1)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--mlp_ratio", type=int, default=3)
    p.add_argument("--platform", default=None)
    p.add_argument("--every", type=int, default=1,
                   help="use every Nth checkpoint")
    p.add_argument("--max_ckpts", type=int, default=0, help="0 = all")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    import jax
    import jax.numpy as jnp

    from druggen_tpu.chem.vocab import get_vocab, read_smiles_file
    from druggen_tpu.data.dataset import featurize_smiles
    from druggen_tpu.infer.seq2seq import generator_failure_pairs
    from druggen_tpu.models import Generator
    from druggen_tpu.train import checkpoint as ckpt

    ckpts = sorted(
        glob.glob(os.path.join(args.model_dir, "*-G.ckpt")),
        key=lambda s: [int(x) for x in
                       re.findall(r"(\d+)-(\d+)-G\.ckpt$", s)[0]]
        if re.search(r"\d+-\d+-G\.ckpt$", s) else [10 ** 9, 0])
    ckpts = [c for c in ckpts if re.search(r"\d+-\d+-G\.ckpt$", c)]
    ckpts = ckpts[::max(args.every, 1)]
    if args.max_ckpts:
        ckpts = ckpts[:args.max_ckpts]
    if not ckpts:
        sys.exit(f"no cadence checkpoints in {args.model_dir}")
    print(f"mining {len(ckpts)} checkpoints from {args.model_dir}",
          flush=True)

    vocab = get_vocab(args.smiles, args.drug_smiles or args.smiles,
                      args.max_atom,
                      cache_dir=os.path.join(
                          os.path.dirname(args.smiles) or ".", "vocab"))
    corpus = read_smiles_file(args.smiles)
    # a fresh slice of real graphs per checkpoint: more input diversity
    need = args.samples_per_ckpt * len(ckpts)
    data = featurize_smiles(corpus[:min(need, len(corpus))], vocab,
                            args.max_atom)
    n_graphs = data.x.shape[0]
    vertexes = int(data.x.shape[1])
    print(f"{n_graphs} real graphs featurized", flush=True)

    G = Generator(act="relu", vertexes=vertexes, edges=vocab.b_dim,
                  nodes=vocab.m_dim, dropout=0.0, dim=args.dim,
                  depth=args.depth, heads=args.heads,
                  mlp_ratio=args.mlp_ratio)
    template = G.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, vertexes, vertexes, vocab.b_dim)),
                      jnp.zeros((1, vertexes, vocab.m_dim)))

    @jax.jit
    def fwd(p, a_labels, x_labels):
        a = jax.nn.one_hot(a_labels, vocab.b_dim)
        x = jax.nn.one_hot(x_labels, vocab.m_dim)
        _, _, nl, el = G.apply(p, a, x)
        return (jnp.argmax(nl, -1).astype(jnp.int32),
                jnp.argmax(el, -1).astype(jnp.int32))

    seen: set[str] = set()
    pairs: list[tuple[str, str]] = []
    per_ckpt = []
    t0 = time.time()
    off = 0
    for idx, path in enumerate(ckpts):
        params = ckpt.load_params_auto(path, template)
        nodes, edges = [], []
        take = min(args.samples_per_ckpt, n_graphs)
        for i in range(0, take - args.batch + 1, args.batch):
            j = (off + i) % max(n_graphs - args.batch, 1)
            n, e = fwd(params, jnp.asarray(data.a[j:j + args.batch]),
                       jnp.asarray(data.x[j:j + args.batch]))
            nodes.append(np.asarray(n))
            edges.append(np.asarray(e))
        off = (off + take) % max(n_graphs - args.batch, 1)
        nodes = np.concatenate(nodes)
        edges = np.concatenate(edges)
        found = generator_failure_pairs(nodes, edges, vocab)
        fresh = 0
        for s, t in found:
            if s not in seen:
                seen.add(s)
                pairs.append((s, t))
                fresh += 1
        name = os.path.basename(path)
        per_ckpt.append({"ckpt": name, "samples": int(len(nodes)),
                         "failures": len(found), "fresh": fresh})
        print(f"[{idx + 1}/{len(ckpts)}] {name}: {len(found)} failures, "
              f"{fresh} new (total {len(pairs)}) "
              f"[{time.time() - t0:.0f}s]", flush=True)

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"pairs": pairs, "per_ckpt": per_ckpt,
                   "model_dir": args.model_dir,
                   "samples_per_ckpt": args.samples_per_ckpt}, f)
    print(f"wrote {args.out}: {len(pairs)} unique pairs from "
          f"{len(ckpts)} checkpoints in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
