"""mTAND-tier extras: VAE loss terms, toy generators, timepoint
subsampling, per-class balanced sampling, Noam schedule — vs torch/numpy
oracles of the reference code (mTAND/utils.py, utils_phy12.py)."""

import numpy as np
import pytest
import torch

from raindrop_tpu.data.sampler import balanced_sample_per_class
from raindrop_tpu.data.toy import (
    irregularly_sampled_data_gen,
    kernel_smoother_data,
    sine_wave_data,
    subsample_timepoints,
    toy_data,
)
from raindrop_tpu.nn.losses import (
    log_normal_pdf,
    masked_mse,
    normal_kl,
    per_timestep_ce,
    vae_elbo_terms,
)


class TestVaeLosses:
    def setup_method(self):
        rng = np.random.default_rng(0)
        self.x = rng.normal(size=(4, 7, 3)).astype(np.float32)
        self.mean = rng.normal(size=(4, 7, 3)).astype(np.float32)
        self.logvar = rng.normal(size=(4, 7, 3)).astype(np.float32)
        self.mask = (rng.uniform(size=(4, 7, 3)) > 0.4).astype(np.float32)

    def test_log_normal_pdf_vs_torch(self):
        # reference mTAND/utils.py:29-33
        const = torch.log(torch.tensor([2.0 * np.pi]))
        t = -0.5 * (const + torch.tensor(self.logvar)
                    + (torch.tensor(self.x) - torch.tensor(self.mean)) ** 2
                    / torch.exp(torch.tensor(self.logvar))) \
            * torch.tensor(self.mask)
        ours = log_normal_pdf(self.x, self.mean, self.logvar, self.mask)
        np.testing.assert_allclose(np.asarray(ours), t.numpy(), rtol=1e-5)

    def test_normal_kl_identities(self):
        # KL(p || p) == 0; KL vs standard normal closed form
        z = np.zeros((5,), np.float32)
        np.testing.assert_allclose(
            np.asarray(normal_kl(self.mean, self.logvar,
                                 self.mean, self.logvar)), 0.0, atol=1e-6)
        mu, lv = self.mean[0, 0], self.logvar[0, 0]
        expect = -lv / 2 + (np.exp(lv) + mu ** 2) / 2 - 0.5
        np.testing.assert_allclose(
            np.asarray(normal_kl(mu, lv, z[:3], z[:3])), expect, rtol=1e-5)

    def test_masked_mse(self):
        got = masked_mse(self.x, self.mean, self.mask)
        want = (((self.x - self.mean) ** 2) * self.mask).sum() / self.mask.sum()
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)

    def test_vae_elbo_terms_shapes_and_norm(self):
        dim = 3
        batch = np.concatenate([self.x, self.mask], axis=-1)
        qm = np.random.default_rng(1).normal(size=(4, 8)).astype(np.float32)
        qlv = np.zeros_like(qm)
        logpx, kl = vae_elbo_terms(dim, batch, qm, qlv, self.mean, 0.1)
        assert logpx.shape == (4,) and kl.shape == (4,)
        # KL(N(qm, 1) || N(0, 1)) = sum(qm^2)/2
        np.testing.assert_allclose(np.asarray(kl), (qm ** 2).sum(-1) / 2,
                                   rtol=1e-5)
        logpx_n, kl_n = vae_elbo_terms(dim, batch, qm, qlv, self.mean, 0.1,
                                       normalize=True)
        denom = self.mask.sum((-1, -2))
        np.testing.assert_allclose(np.asarray(logpx_n),
                                   np.asarray(logpx) / denom, rtol=1e-5)

    def test_per_timestep_ce_vs_torch(self):
        # reference compute_pertp_loss (mTAND/utils.py:818-829)
        rng = np.random.default_rng(2)
        B, L, C, D = 3, 6, 7, 12
        logits = rng.normal(size=(B, L, C)).astype(np.float32)
        onehot = np.eye(C, dtype=np.float32)[rng.integers(0, C, (B, L))]
        mask = (rng.uniform(size=(B, L, D)) > 0.7).astype(np.float32)
        crit = torch.nn.CrossEntropyLoss(reduction="none")
        tl = torch.tensor(logits).reshape(B * L, C)
        tt = torch.tensor(onehot).reshape(B * L, C).max(-1)[1]
        tm = (torch.tensor(mask).sum(-1) > 0).reshape(B * L, 1)
        ce = crit(tl, tt.long()) * tm[:, 0]
        want = (ce.sum() / tm.sum()).item()
        got = float(per_timestep_ce(logits, onehot, mask))
        assert got == pytest.approx(want, rel=1e-5)


class TestToyGenerators:
    def test_irregular_gen_shapes_and_determinism(self):
        v1, g1, t1 = irregularly_sampled_data_gen(4, 20, seed=3)
        v2, g2, t2 = irregularly_sampled_data_gen(4, 20, seed=3)
        assert v1.shape == (4, 3, 20) and g1.shape == (4, 3, 100)
        assert t1.shape == (4, 3, 20)
        np.testing.assert_array_equal(v1, v2)
        assert (np.diff(t1, axis=-1) >= 0).all()   # times sorted

    def test_sine_wave_data(self):
        d = sine_wave_data(10, 15, seed=0)
        assert d["train"].shape == (8, 15, 3) and d["test"].shape == (2, 15, 3)
        assert d["input_dim"] == 1
        # mask column is all ones, time column in [0, 1]
        assert (d["train"][:, :, 1] == 1).all()
        assert d["train"][:, :, 2].min() >= 0 and d["train"][:, :, 2].max() <= 1

    def test_kernel_smoother_data_smooth(self):
        d = kernel_smoother_data(6, 30, alpha=100.0, seed=1)
        assert d["ground_truth"].shape == (6, 100)
        # smoothed values stay within the key-value range
        assert np.abs(d["dataset_obj"][:, :, 0]).max() < 10

    def test_toy_data_block_layout(self):
        n, L = 5, 20
        d = toy_data(n, L, seed=0)
        full = d["dataset_obj"]                    # [N, 3L, 7]
        assert full.shape == (n, 3 * L, 7)
        mask = full[:, :, 3:6]
        # channel i observed exactly in its own [i*L, (i+1)*L) block
        for i in range(3):
            block = mask[:, i * L:(i + 1) * L]
            assert (block[:, :, i] == 1).all()
            assert block[:, :, [j for j in range(3) if j != i]].sum() == 0

    def test_subsample_timepoints(self):
        rng = np.random.default_rng(0)
        data = rng.normal(size=(3, 10, 4)).astype(np.float32)
        mask = (rng.uniform(size=(3, 10, 4)) > 0.3).astype(np.float32)
        tt = np.linspace(0, 1, 10)
        d2, _, m2 = subsample_timepoints(data, tt, mask, 0.5,
                                         rng=np.random.default_rng(1))
        for i in range(3):
            before = (mask[i].sum(-1) > 0).sum()
            after = (m2[i].sum(-1) > 0).sum()
            assert after == int(before * 0.5)
            dropped = (mask[i].sum(-1) > 0) & (m2[i].sum(-1) == 0)
            assert (d2[i][dropped] == 0).all()
        # originals untouched (operates on copies)
        assert mask.sum() > m2.sum()


class TestSamplerAndSchedule:
    def test_balanced_sample_per_class(self):
        y = np.repeat(np.arange(8), 50)
        idx = balanced_sample_per_class(y, 64, np.random.default_rng(0))
        assert idx.shape == (64,)
        classes, counts = np.unique(y[idx], return_counts=True)
        assert classes.tolist() == list(range(8))
        assert (counts == 8).all()
        # reference layout: class-0 block first (utils_phy12.py:413-414)
        assert (y[idx[:8]] == 0).all()

    def test_noam_schedule_vs_reference_rate(self):
        from raindrop_tpu.train.plateau import noam_schedule
        model_size, factor, warmup = 36, 2.0, 400

        def ref_rate(step):   # utils_phy12.py:536-542
            return factor * (model_size ** -0.5
                             * min(step ** -0.5, step * warmup ** -1.5))

        sched = noam_schedule(model_size, factor, warmup)
        for count in [0, 1, 10, 399, 400, 5000]:
            assert float(sched(count)) == pytest.approx(
                ref_rate(count + 1), rel=1e-5)
        # warmup then decay
        assert float(sched(10)) < float(sched(399))
        assert float(sched(5000)) < float(sched(399))
