"""Seq2seq corrector tests: tokenizer round-trip, model shapes, greedy
decode machinery, overfit-on-tiny-data learning signal, save/load."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from druggen_tpu.infer.seq2seq import (
    EOS,
    PAD,
    SOS,
    Seq2Seq,
    Seq2SeqCorrector,
    Tokenizer,
    corruption_pairs,
    greedy_decode,
    tokenize,
    train_corrector,
)

CORPUS = ["CCO", "CCN", "c1ccccc1", "CC(=O)O", "CCCC", "C1CCCCC1",
          "Clc1ccccc1", "CC(C)O", "CCOC", "OCCO"]


def test_tokenizer_roundtrip():
    tok = Tokenizer.build(CORPUS + ["[NH4+]", "%12CC%12", "C@@H"])
    for s in CORPUS:
        ids = tok.encode(s, 32)
        assert ids[0] == SOS
        assert EOS in ids
        assert tok.decode(ids) == s
    # bracket atoms and %nn closures survive as single tokens
    assert tokenize("[NH4+]") == ["[NH4+]"]
    assert tokenize("Clc1%12") == ["Cl", "c", "1", "%12"]


def test_model_shapes():
    tok = Tokenizer.build(CORPUS)
    model = Seq2Seq(vocab_size=tok.size, hid=32, heads=4, pf=64,
                    n_layers=2, max_len=16)
    src = jnp.asarray(np.stack([tok.encode(s, 16) for s in CORPUS[:4]]))
    params = model.init(jax.random.PRNGKey(0), src, src)
    logits = model.apply(params, src, src)
    assert logits.shape == (4, 16, tok.size)
    out = greedy_decode(model, params, src)
    assert out.shape == (4, 16)
    assert (np.asarray(out)[:, 0] == SOS).all()


def test_corruption_pairs():
    rng = np.random.default_rng(0)
    pairs = corruption_pairs(CORPUS, rng, n_per_mol=2)
    assert len(pairs) > 0
    assert all(correct in CORPUS for _, correct in pairs)
    assert any(bad != good for bad, good in pairs)


@pytest.mark.slow
def test_corrector_learns_identity():
    """A tiny model trained briefly on a tiny corpus should at least learn
    to emit corpus-like tokens and reproduce some inputs verbatim."""
    corrector = train_corrector(CORPUS, steps=300, batch=16, lr=1e-3,
                                hid=64, heads=4, pf=128, n_layers=2,
                                max_len=16, log_every=0)
    outs = corrector.translate_batch(CORPUS)
    assert len(outs) == len(CORPUS)
    hits = sum(1 for o, s in zip(outs, CORPUS) if o == s)
    assert hits >= len(CORPUS) // 2, f"only {hits} exact: {outs}"


def test_save_load_roundtrip(tmp_path):
    corrector = train_corrector(CORPUS, steps=5, batch=8, hid=32, heads=4,
                                pf=64, n_layers=1, max_len=16, log_every=0)
    corrector.save(str(tmp_path / "ckpt"))
    loaded = Seq2SeqCorrector.load(str(tmp_path / "ckpt"))
    a = corrector.translate("CCO")
    b = loaded.translate("CCO")
    assert a == b
