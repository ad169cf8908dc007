"""Reference-corrector interop: torchtext-vocab unpickling without
torchtext, state_dict -> jnp conversion, and activation parity of our
reference-exact transformer (infer/seq2seq_ref.py) against a fresh torch
re-execution of the reference topology (smiles_cor.py:575-882).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from druggen_tpu.infer import seq2seq_ref as s2s  # noqa: E402
from druggen_tpu.interop.corrector_ckpt import (  # noqa: E402
    ReferenceCorrector,
    convert_corrector_state_dict,
    install_torchtext_shim,
    load_torchtext_vocab,
)

HID, HEADS, PF, LAYERS, MAXLEN, VOC = 64, 4, 128, 2, 24, 37


# --- fresh torch re-execution of the reference topology (same param
# names; the math is the textbook post-LN transformer the reference uses)

class _MHA(nn.Module):
    def __init__(self):
        super().__init__()
        self.fc_q = nn.Linear(HID, HID)
        self.fc_k = nn.Linear(HID, HID)
        self.fc_v = nn.Linear(HID, HID)
        self.fc_o = nn.Linear(HID, HID)

    def forward(self, q, k, v, mask):
        b = q.shape[0]
        hd = HID // HEADS
        Q = self.fc_q(q).view(b, -1, HEADS, hd).permute(0, 2, 1, 3)
        K = self.fc_k(k).view(b, -1, HEADS, hd).permute(0, 2, 1, 3)
        V = self.fc_v(v).view(b, -1, HEADS, hd).permute(0, 2, 1, 3)
        e = Q @ K.permute(0, 1, 3, 2) / (hd ** 0.5)
        e = e.masked_fill(mask == 0, -1e10)
        x = (torch.softmax(e, -1) @ V).permute(0, 2, 1, 3).reshape(b, -1, HID)
        return self.fc_o(x)


class _FF(nn.Module):
    def __init__(self):
        super().__init__()
        self.fc_1 = nn.Linear(HID, PF)
        self.fc_2 = nn.Linear(PF, HID)

    def forward(self, x):
        return self.fc_2(torch.relu(self.fc_1(x)))


class _EncLayer(nn.Module):
    def __init__(self):
        super().__init__()
        self.self_attn_layer_norm = nn.LayerNorm(HID)
        self.ff_layer_norm = nn.LayerNorm(HID)
        self.self_attention = _MHA()
        self.positionwise_feedforward = _FF()

    def forward(self, x, mask):
        x = self.self_attn_layer_norm(x + self.self_attention(x, x, x, mask))
        return self.ff_layer_norm(x + self.positionwise_feedforward(x))


class _DecLayer(nn.Module):
    def __init__(self):
        super().__init__()
        self.self_attn_layer_norm = nn.LayerNorm(HID)
        self.enc_attn_layer_norm = nn.LayerNorm(HID)
        self.ff_layer_norm = nn.LayerNorm(HID)
        self.self_attention = _MHA()
        self.encoder_attention = _MHA()
        self.positionwise_feedforward = _FF()

    def forward(self, x, enc, tmask, smask):
        x = self.self_attn_layer_norm(x + self.self_attention(x, x, x, tmask))
        x = self.enc_attn_layer_norm(
            x + self.encoder_attention(x, enc, enc, smask))
        return self.ff_layer_norm(x + self.positionwise_feedforward(x))


class _Side(nn.Module):
    def __init__(self, decoder: bool):
        super().__init__()
        self.tok_embedding = nn.Embedding(VOC, HID)
        self.pos_embedding = nn.Embedding(MAXLEN, HID)
        self.layers = nn.ModuleList(
            [_DecLayer() if decoder else _EncLayer() for _ in range(LAYERS)])
        if decoder:
            self.fc_out = nn.Linear(HID, VOC)


class _RefModel(nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = _Side(False)
        self.decoder = _Side(True)

    def forward(self, src, trg):
        smask = (src != s2s.PAD).unsqueeze(1).unsqueeze(2)
        tpad = (trg != s2s.PAD).unsqueeze(1).unsqueeze(2)
        sub = torch.tril(torch.ones(trg.shape[1], trg.shape[1])).bool()
        tmask = tpad & sub
        pos = torch.arange(src.shape[1]).unsqueeze(0)
        x = self.encoder.tok_embedding(src) * (HID ** 0.5) \
            + self.encoder.pos_embedding(pos)
        for l in self.encoder.layers:
            x = l(x, smask)
        tpos = torch.arange(trg.shape[1]).unsqueeze(0)
        y = self.decoder.tok_embedding(trg) * (HID ** 0.5) \
            + self.decoder.pos_embedding(tpos)
        for l in self.decoder.layers:
            y = l(y, x, tmask, smask)
        return self.decoder.fc_out(y)


def test_state_dict_conversion_activation_parity():
    torch.manual_seed(0)
    model = _RefModel().eval()
    params = convert_corrector_state_dict(model.state_dict())
    rng = np.random.default_rng(0)
    src = rng.integers(4, VOC, (3, 11)).astype(np.int64)
    trg = rng.integers(4, VOC, (3, 9)).astype(np.int64)
    src[:, -2:] = s2s.PAD
    with torch.no_grad():
        ref = model(torch.from_numpy(src), torch.from_numpy(trg)).numpy()
    got = np.asarray(s2s.forward(params, jnp.asarray(src), jnp.asarray(trg),
                                 heads=HEADS))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_vocab_shim_roundtrip(tmp_path):
    install_torchtext_shim()
    import torchtext.vocab as tv
    from collections import Counter, defaultdict

    v = tv.Vocab.__new__(tv.Vocab)
    itos = ["<unk>", "<pad>", "<sos>", "<eos>", "C", "c", "1", "(", ")", "O"]
    v.__dict__.update({
        "freqs": Counter({"C": 10, "O": 4}),
        "itos": itos,
        "stoi": defaultdict(tv._default_unk_index,
                            {s: i for i, s in enumerate(itos)}),
        "vectors": None,
    })
    path = str(tmp_path / "vocab_src.pth")
    torch.save(v, path)
    itos2, stoi2 = load_torchtext_vocab(path)
    assert itos2 == itos
    assert stoi2["C"] == 4 and stoi2["<pad>"] == 1


def test_reference_corrector_end_to_end(tmp_path):
    """Full load path: save a reference-shaped .pkg + vocabs, load with
    ReferenceCorrector, greedy-translate a batch (random weights — checks
    plumbing, shapes, and reversed decoding, not chemistry)."""
    torch.manual_seed(1)
    model = _RefModel().eval()
    pkg = str(tmp_path / "model.pkg")
    torch.save(model.state_dict(), pkg)

    install_torchtext_shim()
    import torchtext.vocab as tv
    from collections import Counter, defaultdict

    itos = (["<unk>", "<pad>", "<sos>", "<eos>"]
            + list("Cc1()O=Nn2[]#+-oS3sFBrl") + ["Cl", "Br"])
    itos = itos[:VOC] + ["X"] * max(0, VOC - len(itos))

    def mkvocab(path):
        v = tv.Vocab.__new__(tv.Vocab)
        v.__dict__.update({
            "freqs": Counter(), "itos": itos,
            "stoi": defaultdict(tv._default_unk_index,
                                {s: i for i, s in enumerate(itos)}),
            "vectors": None})
        torch.save(v, path)
        return path

    src_p = mkvocab(str(tmp_path / "v_src.pth"))
    trg_p = mkvocab(str(tmp_path / "v_trg.pth"))
    corr = ReferenceCorrector.load(pkg, src_p, trg_p, heads=HEADS,
                                   max_len=MAXLEN - 2)
    out = corr.translate_batch(["CCO", "c1ccccc1O"])
    assert len(out) == 2
    assert all(isinstance(s, str) for s in out)


def test_decode_tokens_reversed():
    itos = ["<unk>", "<pad>", "<sos>", "<eos>", "C", "O", "N"]
    ids = [4, 5, 6, s2s.EOS, 4]          # C O N <eos> (then junk)
    assert s2s.decode_tokens(ids, itos, reverse=True) == "NOC"
    assert s2s.decode_tokens(ids, itos, reverse=False) == "CON"


def test_smiles_corrector_env_selection(tmp_path, monkeypatch):
    """SmilesCorrector.default picks up $DRUGGEN_REFERENCE_CORRECTOR
    (model.pkg:src.pth:trg.pth) and routes invalid SMILES through it."""
    torch.manual_seed(2)
    model = _RefModel().eval()
    pkg = str(tmp_path / "m.pkg")
    torch.save(model.state_dict(), pkg)
    install_torchtext_shim()
    import torchtext.vocab as tv
    from collections import Counter, defaultdict

    itos = ["<unk>", "<pad>", "<sos>", "<eos>"] + list("Cc1()O=N")
    itos = itos + ["X"] * (VOC - len(itos))

    def mkvocab(path):
        v = tv.Vocab.__new__(tv.Vocab)
        v.__dict__.update({"freqs": Counter(), "itos": itos,
                           "stoi": defaultdict(tv._default_unk_index,
                                               {s: i for i, s in
                                                enumerate(itos)}),
                           "vectors": None})
        torch.save(v, path)
        return path

    spec = ":".join([pkg, mkvocab(str(tmp_path / "s.pth")),
                     mkvocab(str(tmp_path / "t.pth"))])
    monkeypatch.setenv("DRUGGEN_REFERENCE_CORRECTOR", spec)
    monkeypatch.delenv("DRUGGEN_CORRECTOR_CKPT", raising=False)
    from druggen_tpu.infer.corrector import SmilesCorrector

    corr = SmilesCorrector.default()
    from druggen_tpu.interop.corrector_ckpt import ReferenceCorrector
    assert isinstance(corr.neural, ReferenceCorrector)
    # valid SMILES pass through; the invalid one goes through the (random
    # weight) corrector without crashing
    out = corr.correct(["CCO", "CC(("])
    assert "CCO" in out


def test_reference_arch_train_save_load_roundtrip(tmp_path):
    """scripts/train_corrector.py --arch reference path: from-scratch
    training of the weight-compatible topology, saved dir loads through
    ReferenceCorrector.load_trained and translates deterministically."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import numpy as np
    from train_corrector import evaluate_corrector, train_reference_corrector
    from druggen_tpu.data.corpus import DRUGLIKE_SMILES
    from druggen_tpu.interop.corrector_ckpt import ReferenceCorrector

    out = tmp_path / "refarch"
    ref = train_reference_corrector(
        DRUGLIKE_SMILES[:40], [("CCOO)C", "CCOC(O)C")],
        steps=12, batch=4, lr=3e-4, hid=32, n_layers=1, max_len=60,
        out_dir=str(out))
    loaded = ReferenceCorrector.load_trained(str(out))
    srcs = ["CCOO)C", "c1ccccc1("]
    assert ref.translate_batch(srcs) == loaded.translate_batch(srcs)

    metrics = evaluate_corrector(loaded, [("CCOO)C", "CCOC(O)C")])
    assert set(metrics) >= {"validity_after", "exact_repair_rate",
                            "mean_tanimoto_to_target"}
    assert 0.0 <= metrics["mean_tanimoto_to_target"] <= 1.0


def test_fidelity_metric_perfect_on_identity():
    """mean_tanimoto_to_target is 1.0 when the corrector returns the
    target itself."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from train_corrector import evaluate_corrector

    class Echo:
        def translate_batch(self, xs):
            return ["CCO" for _ in xs]

    m = evaluate_corrector(Echo(), [("CC(", "CCO"), ("N1CC", "CCO")])
    assert m["validity_after"] == 1.0
    assert m["exact_repair_rate"] == 1.0
    assert m["mean_tanimoto_to_target"] == 1.0
