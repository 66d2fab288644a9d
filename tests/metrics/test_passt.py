"""PaSST JAX port: parity vs a hear21passt-layout torch replica + KLD wiring
(`ref metrics/kld.py:116-180`)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

D, DEPTH, N_MELS = 128, 2, 128  # D//64 = 2 heads (matches the port's rule)


def _passt_replica(n_classes=527, t_patches=16):
    """hear21passt PaSST module shape (github.com/kkoutini/passt_hear21):
    conv patch embed (16x16 kernel, 10x10 stride), decomposed time/freq pos
    embeds, cls+dist tokens, pre-LN ViT blocks, LN+Linear head over the
    mean of both token features. State-dict compatible with the port's
    ``load_passt_params``."""
    import torch.nn as nn

    class Attn(nn.Module):
        def __init__(self):
            super().__init__()
            self.qkv = nn.Linear(D, 3 * D)
            self.proj = nn.Linear(D, D)

        def forward(self, x):
            B, N, _ = x.shape
            nh, hd = D // 64, 64
            qkv = self.qkv(x).reshape(B, N, 3, nh, hd).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            att = (q @ k.transpose(-2, -1) / hd ** 0.5).softmax(-1)
            return self.proj((att @ v).transpose(1, 2).reshape(B, N, D))

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = nn.LayerNorm(D, eps=1e-6)
            self.attn = Attn()
            self.norm2 = nn.LayerNorm(D, eps=1e-6)
            self.mlp = nn.Sequential()
            self.mlp.fc1 = nn.Linear(D, 4 * D)
            self.mlp.fc2 = nn.Linear(4 * D, D)

        def forward(self, x):
            x = x + self.attn(self.norm1(x))
            h = self.mlp.fc2(torch.nn.functional.gelu(
                self.mlp.fc1(self.norm2(x))))
            return x + h

    class PatchEmbed(nn.Module):
        def __init__(self):
            super().__init__()
            self.proj = nn.Conv2d(1, D, 16, stride=10)

        def forward(self, x):
            return self.proj(x)

    class PaSST(nn.Module):
        def __init__(self):
            super().__init__()
            f_patches = (N_MELS - 16) // 10 + 1
            self.patch_embed = PatchEmbed()
            self.cls_token = nn.Parameter(torch.randn(1, 1, D) * 0.02)
            self.dist_token = nn.Parameter(torch.randn(1, 1, D) * 0.02)
            self.new_pos_embed = nn.Parameter(torch.randn(1, 2, D) * 0.02)
            self.freq_new_pos_embed = nn.Parameter(
                torch.randn(1, D, f_patches, 1) * 0.02)
            self.time_new_pos_embed = nn.Parameter(
                torch.randn(1, D, 1, t_patches) * 0.02)
            self.blocks = nn.ModuleList([Block() for _ in range(DEPTH)])
            self.norm = nn.LayerNorm(D, eps=1e-6)
            self.head = nn.Sequential(nn.LayerNorm(D, eps=1e-6),
                                      nn.Linear(D, n_classes))

        def forward(self, mel):  # [B, 128, F]
            x = self.patch_embed(mel[:, None])  # [B, D, F', T']
            x = x + self.freq_new_pos_embed
            x = x + self.time_new_pos_embed[..., :x.shape[-1]]
            B, _, Fp, Tp = x.shape
            # flatten freq-major to match the port's [F', T'] raster order
            x = x.flatten(2).transpose(1, 2)  # [B, F'*T', D]
            cls = self.cls_token.expand(B, -1, -1) + self.new_pos_embed[:, :1]
            dist = (self.dist_token.expand(B, -1, -1)
                    + self.new_pos_embed[:, 1:])
            x = torch.cat([cls, dist, x], dim=1)
            for blk in self.blocks:
                x = blk(x)
            x = self.norm(x)
            return self.head((x[:, 0] + x[:, 1]) / 2)

    torch.manual_seed(0)
    return PaSST().eval()


def test_passt_forward_parity(tmp_path):
    import jax.numpy as jnp
    from audiocraft_tpu.metrics.passt import load_passt_params, passt_apply

    ref = _passt_replica()
    # save with the PasstBasicWrapper "net." prefix like hear21passt bundles
    pth = tmp_path / "passt.pt"
    torch.save({"net." + k: v for k, v in ref.state_dict().items()}, pth)
    params = load_passt_params(pth)

    rng = np.random.RandomState(0)
    mel = rng.randn(2, N_MELS, 96).astype(np.float32)  # T'=9 <= 16 trained
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(mel)).numpy()
    out = np.asarray(passt_apply(params, jnp.asarray(mel)))
    assert out.shape == ref_out.shape == (2, 527)
    err = np.abs(out - ref_out).max()
    assert err < 2e-4, f"passt logits mismatch: {err}"


def test_passt_mel_matches_torch_stft():
    """The numpy preprocessing must match the torch.stft-based
    AugmentMelSTFT eval path (preemphasis, centered reflect STFT with
    symmetric hann win 800 in n_fft 1024, power, slaney mel, log, (x+4.5)/5)."""
    from audiocraft_tpu.metrics.passt import (_slaney_mel_matrix, passt_mel,
                                              HOP_LENGTH, N_FFT, SAMPLE_RATE,
                                              WIN_LENGTH)
    rng = np.random.RandomState(1)
    wav = (0.3 * rng.randn(SAMPLE_RATE)).astype(np.float32)

    x = torch.from_numpy(wav)
    x = torch.nn.functional.conv1d(
        x[None, None], torch.tensor([[[-0.97, 1.0]]]))[0, 0]
    window = torch.hann_window(WIN_LENGTH, periodic=False)
    spec = torch.stft(x, N_FFT, hop_length=HOP_LENGTH, win_length=WIN_LENGTH,
                      window=window, center=True, pad_mode="reflect",
                      normalized=False, return_complex=True)
    power = spec.abs() ** 2  # [freq, frames]
    melmat = torch.from_numpy(
        _slaney_mel_matrix(N_FFT // 2 + 1, SAMPLE_RATE, 128, 0.0,
                           SAMPLE_RATE / 2))
    mel = (melmat.T @ power + 1e-5).log()
    ref = ((mel + 4.5) / 5.0).numpy()

    ours = passt_mel(wav)
    assert ours.shape == ref.shape
    err = np.abs(ours - ref).max()
    assert err < 1e-3, f"mel preprocessing mismatch: {err}"


def test_passt_slaney_mel_matches_librosa_values():
    """Spot-check the slaney filterbank against known librosa behavior:
    filters are triangular, non-negative, and area-normalized (enorm)."""
    from audiocraft_tpu.metrics.passt import _slaney_mel_matrix
    m = _slaney_mel_matrix(513, 32000, 128, 0.0, 16000.0)
    assert m.shape == (513, 128)
    assert (m >= 0).all()
    # each filter has a single peak (unimodal triangle)
    for i in range(0, 128, 17):
        col = m[:, i]
        peak = col.argmax()
        assert (np.diff(col[:peak + 1]) >= -1e-9).all()
        assert (np.diff(col[peak:]) <= 1e-9).all()


def test_passt_classifier_and_kld_metric(tmp_path):
    """End-to-end: PasstClassifier segments + averages probs, and
    PasstKLDivergenceMetric auto-probes the checkpoint (`kld.py:116-180`)."""
    import os
    from audiocraft_tpu.metrics.passt import PasstClassifier, load_passt_params
    from audiocraft_tpu.metrics.kld import PasstKLDivergenceMetric

    ref = _passt_replica()
    pth = tmp_path / "passt.pt"
    torch.save(ref.state_dict(), pth)  # bare keys path
    params = load_passt_params(pth)

    # min 0.15s keeps every segment >= one 16-frame patch column
    clf = PasstClassifier(params, max_duration=0.2, min_duration=0.15)
    sr = 32000
    rng = np.random.RandomState(0)
    wav = (0.1 * rng.randn(2, 1, int(0.5 * sr))).astype(np.float32)
    probs = clf(wav, sr)
    assert probs.shape == (2, 527)
    assert np.allclose(probs.sum(-1), 1.0, atol=1e-4)

    # metric auto-probe via $PASST_CHECKPOINT
    old = os.environ.get("PASST_CHECKPOINT")
    os.environ["PASST_CHECKPOINT"] = str(pth)
    try:
        metric = PasstKLDivergenceMetric()
        assert metric.classifier_fn is not None
        metric.update(wav, wav + 0.01 * rng.randn(*wav.shape).astype(np.float32),
                      np.asarray([wav.shape[-1]] * 2), np.asarray([sr] * 2))
        out = metric.compute()
        assert np.isfinite(out["kld"]) and out["kld"] >= 0
    finally:
        if old is None:
            os.environ.pop("PASST_CHECKPOINT", None)
        else:
            os.environ["PASST_CHECKPOINT"] = old
