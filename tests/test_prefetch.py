"""Streaming input pipeline: native batch gathers + PrefetchExecutor."""

import numpy as np
import pytest

from raindrop_tpu import native
from raindrop_tpu.data.prefetch import PrefetchExecutor, assemble_batch
from raindrop_tpu.data.sampler import balanced_batches


def make_data(n=64, t=12, f=5, static=True, seed=0):
    rng = np.random.default_rng(seed)
    data = {
        "P": rng.normal(size=(n, t, 2 * f)).astype(np.float32),
        "time": rng.uniform(size=(n, t)).astype(np.float32),
        "y": rng.integers(0, 2, size=(n,)).astype(np.int64),
    }
    if static:
        data["static"] = rng.normal(size=(n, 4)).astype(np.float32)
    return data


class TestNativeGather:
    def setup_method(self):
        if not native.available():
            pytest.skip("native library unavailable")

    def test_gather_rows_matches_numpy(self):
        data = make_data()
        idx = np.array([3, 0, 63, 17, 3])
        np.testing.assert_array_equal(native.gather_rows(data["P"], idx),
                                      data["P"][idx])
        np.testing.assert_array_equal(native.gather_rows(data["static"], idx),
                                      data["static"][idx])

    def test_gather_time_major_matches_numpy(self):
        data = make_data()
        idx = np.array([5, 1, 2])
        got = native.gather_time_major(data["P"], idx)
        want = np.moveaxis(data["P"][idx], 0, 1)
        assert got.shape == want.shape == (12, 3, 10)
        np.testing.assert_array_equal(got, want)


class TestAssembleBatch:
    @pytest.mark.parametrize("use_native", [False, True])
    @pytest.mark.parametrize("time_major", [False, True])
    def test_matches_fancy_indexing(self, use_native, time_major):
        if use_native and not native.available():
            pytest.skip("native library unavailable")
        data = make_data()
        idx = np.array([9, 4, 4, 31])
        got = assemble_batch(data, idx, time_major=time_major,
                             use_native=use_native)
        np.testing.assert_array_equal(got["y"], data["y"][idx])
        np.testing.assert_array_equal(got["static"], data["static"][idx])
        P, tm = data["P"][idx], data["time"][idx]
        if time_major:
            P, tm = np.moveaxis(P, 0, 1), tm.T
        np.testing.assert_array_equal(got["P"], P)
        np.testing.assert_array_equal(got["time"], tm)


class TestPrefetchExecutor:
    def test_order_and_content(self):
        data = make_data()
        batches = [np.array([0, 1]), np.array([5, 9]), np.array([63, 2])]
        with PrefetchExecutor(data, batches, depth=2) as ex:
            out = list(ex)
        assert len(out) == 3
        for want_idx, got in zip(batches, out):
            np.testing.assert_array_equal(got["y"], data["y"][want_idx])
            np.testing.assert_array_equal(got["P"], data["P"][want_idx])

    def test_bounded_depth_blocks_producer(self):
        import time
        data = make_data()
        n_batches = 50
        produced = []

        def gen():
            for i in range(n_batches):
                produced.append(i)
                yield np.array([i % 64])

        ex = PrefetchExecutor(data, gen(), depth=2)
        time.sleep(0.3)
        # producer must be throttled well below the full stream
        assert len(produced) <= 4
        ex.close()

    def test_exception_propagates(self):
        data = make_data()

        def gen():
            yield np.array([0])
            raise RuntimeError("boom")

        ex = PrefetchExecutor(data, gen(), depth=2)
        assert next(ex) is not None
        with pytest.raises(RuntimeError, match="boom"):
            while True:
                next(ex)

    def test_to_device_hook_runs_on_producer(self):
        import threading
        data = make_data()
        seen_threads = []

        def to_dev(batch):
            seen_threads.append(threading.current_thread().name)
            return {k: v + 0 for k, v in batch.items()}

        with PrefetchExecutor(data, [np.array([1])], to_device=to_dev) as ex:
            list(ex)
        assert seen_threads and all(
            t != threading.main_thread().name for t in seen_threads)

    def test_streamed_training_loop(self):
        """End-to-end: balanced sampler -> executor -> jit train step on the
        flagship model; loss decreases over the stream."""
        import jax
        import jax.numpy as jnp
        import optax
        from raindrop_tpu.config import dataset_config
        from raindrop_tpu.models.raindrop import raindrop_apply, raindrop_init

        cfg = dataset_config("PAM", max_len=8)
        rng = np.random.default_rng(0)
        N, T, F = 64, cfg.max_len, cfg.d_inp
        mask = (rng.uniform(size=(N, T, F)) > 0.5).astype(np.float32)
        data = {
            "P": np.concatenate(
                [rng.normal(size=(N, T, F)).astype(np.float32) * mask, mask],
                -1),
            "time": np.cumsum(rng.uniform(0.1, 1.0, size=(N, T)),
                              1).astype(np.float32),
            "y": rng.integers(0, cfg.n_classes, size=(N,)).astype(np.int64),
        }
        params = raindrop_init(jax.random.PRNGKey(0), cfg)
        opt = optax.adam(1e-2)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state, batch, key):
            def loss_fn(p):
                lengths = jnp.sum(batch["time"] > 0, axis=0)
                logits, _ = raindrop_apply(
                    p, cfg, batch["P"], None, batch["time"], lengths,
                    train=True, rng=key)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, batch["y"]).mean()
            loss, g = jax.value_and_grad(loss_fn)(params)
            u, opt_state = opt.update(g, opt_state)
            return optax.apply_updates(params, u), opt_state, loss

        sampler_rng = np.random.default_rng(1)
        idx_stream = [
            sampler_rng.choice(N, size=16, replace=False) for _ in range(30)]
        losses = []
        key = jax.random.PRNGKey(0)
        with PrefetchExecutor(data, idx_stream, time_major=True,
                              to_device=jax.device_put) as ex:
            for batch in ex:
                key, k = jax.random.split(key)
                params, opt_state, loss = step(params, opt_state, batch, k)
                losses.append(float(loss))
        assert len(losses) == 30
        assert np.mean(losses[-5:]) < np.mean(losses[:5])

    def test_sampler_integration(self):
        data = make_data(n=128)
        rng = np.random.default_rng(0)
        stream = balanced_batches(data["y"], 16, 2, rng)
        with PrefetchExecutor(data, stream) as ex:
            for batch in ex:
                # strategy-2 batches are half negatives, half positives
                assert (batch["y"] == 0).sum() == 8
                assert (batch["y"] == 1).sum() == 8


def test_trainer_streaming_pipeline_matches_resident():
    """The PRODUCT wiring (VERDICT r3 #3b): Trainer with
    tcfg.input_pipeline='streaming' trains through PrefetchExecutor and
    produces IDENTICAL results to the resident per-step path — same
    sampler stream, same compiled train step, only the batch transport
    differs."""
    from raindrop_tpu.config import TrainConfig, dataset_config
    from raindrop_tpu.data.datasets import synthetic_split
    from raindrop_tpu.train.trainer import Trainer

    cfg = dataset_config("P19", max_len=8)
    cfg = type(cfg)(**{**cfg.__dict__, "d_ob": 2})
    split = synthetic_split("P19", n=120, seed=0, T=8)

    def run(pipeline, scan):
        tcfg = TrainConfig(dataset="P19", num_epochs=2, batch_size=16,
                           n_splits=1, seed=3, scan_epoch=scan,
                           input_pipeline=pipeline)
        tr = Trainer(cfg, tcfg)
        return tr.train_split(split, verbose=False)

    res_stream = run("streaming", scan=True)   # streaming overrides scan
    res_step = run("resident", scan=False)
    assert res_stream.test_metrics == res_step.test_metrics
    for a, b in zip(res_stream.history, res_step.history):
        assert a["val_auroc"] == b["val_auroc"]
        np.testing.assert_allclose(a["train_loss"], b["train_loss"],
                                   rtol=1e-6)


def test_trainer_streaming_rejects_bad_pipeline():
    from raindrop_tpu.config import TrainConfig, dataset_config
    from raindrop_tpu.data.datasets import synthetic_split
    from raindrop_tpu.train.trainer import Trainer

    cfg = dataset_config("P19", max_len=8)
    split = synthetic_split("P19", n=40, seed=0, T=8)
    tcfg = TrainConfig(dataset="P19", num_epochs=1, batch_size=8,
                       input_pipeline="bogus")
    with pytest.raises(ValueError, match="input_pipeline"):
        Trainer(cfg, tcfg).train_split(split, verbose=False)
