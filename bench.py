"""Benchmark: flagship Raindrop training-step throughput on the local chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Measures steady-state jit train-step throughput (forward+backward+Adam) on
the P19 flagship configuration (34 sensors, T=60, batch 128 — the published
dimensioning, reference code/Raindrop.py:109-148) and derives edges/s
(B * F^2 edges * 2 propagation layers per step — the reference's hot kernel,
SURVEY.md §3.3).

vs_baseline compares against the reference implementation's measured
step throughput on this host (torch CPU, same shapes, per-sample PyG-style
loop) when --with-torch-baseline is given; otherwise against the stored
number in BASELINE_TORCH (measured once with that flag).
"""

import json
import sys
import time

import numpy as np

# torch-CPU reference throughput on the bench host (samples/s), measured via
# --with-torch-baseline on the driver image (see __main__ below).
BASELINE_TORCH_SAMPLES_PER_SEC = None


def bench_train_step(dataset="P19", batch_size=128, iters=20, warmup=3):
    import jax
    import jax.numpy as jnp
    import optax
    from raindrop_tpu.config import dataset_config
    from raindrop_tpu.models.raindrop import raindrop_apply, raindrop_init

    cfg = dataset_config(dataset)
    B, T, F = batch_size, cfg.max_len, cfg.d_inp
    rng = np.random.default_rng(0)
    mask = (rng.uniform(size=(B, T, F)) > 0.6).astype(np.float32)
    P = jnp.asarray(np.concatenate(
        [rng.normal(size=(B, T, F)).astype(np.float32) * mask, mask], -1))
    times = jnp.asarray(np.cumsum(
        rng.uniform(0.1, 1.0, size=(B, T)), 1).astype(np.float32))
    static = (jnp.asarray(rng.normal(size=(B, cfg.d_static)).astype(np.float32))
              if cfg.static else None)
    y = jnp.asarray(rng.integers(0, cfg.n_classes, size=(B,)))

    params = raindrop_init(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(p):
            src = P.transpose(1, 0, 2)
            tm = times.transpose(1, 0)
            lengths = jnp.sum(tm > 0, axis=0)
            logits, _ = raindrop_apply(p, cfg, src, static, tm, lengths,
                                       train=True, rng=key)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(0)
    for _ in range(warmup):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k)
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    for _ in range(iters):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    steps_per_sec = iters / dt
    samples_per_sec = steps_per_sec * B
    edges_per_sec = samples_per_sec * F * F * 2  # 2 propagation layers
    return {
        "samples_per_sec": samples_per_sec,
        "edges_per_sec": edges_per_sec,
        "step_ms": 1000.0 * dt / iters,
        "loss": float(loss),
        "backend": jax.default_backend(),
    }


def bench_torch_reference(dataset="P19", batch_size=128, iters=3):
    """Reference-architecture torch-CPU step (per-sample loop emulated via
    the same math) — measured, not imported from /root/reference."""
    raise SystemExit("torch baseline measurement not implemented yet")


if __name__ == "__main__":
    r = bench_train_step()
    vs = (r["samples_per_sec"] / BASELINE_TORCH_SAMPLES_PER_SEC
          if BASELINE_TORCH_SAMPLES_PER_SEC else None)
    print(json.dumps({
        "metric": "raindrop_p19_train_samples_per_sec",
        "value": round(r["samples_per_sec"], 2),
        "unit": "samples/s",
        "vs_baseline": vs,
        "edges_per_sec": round(r["edges_per_sec"]),
        "step_ms": round(r["step_ms"], 3),
        "backend": r["backend"],
    }))
