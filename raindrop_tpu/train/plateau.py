"""ReduceLROnPlateau with torch semantics.

The reference steps torch.optim.lr_scheduler.ReduceLROnPlateau(mode='max',
factor=0.1, patience=1, threshold=1e-4 rel, cooldown=0, min_lr=1e-8) on the
per-epoch validation AUPRC (reference code/Raindrop.py:257-259,368). optax
has no plateau scheduler, so the state machine lives here (host-side) and
the current LR is fed to the optimizer by injection.

torch semantics reproduced: 'rel' threshold in max mode means an epoch is an
improvement iff metric > best * (1 + threshold); LR drops by `factor` after
`patience` consecutive non-improving epochs, floored at min_lr.
"""

from __future__ import annotations


class ReduceLROnPlateau:
    def __init__(self, lr: float, mode: str = "max", factor: float = 0.1,
                 patience: int = 1, threshold: float = 1e-4,
                 min_lr: float = 1e-8):
        if mode not in ("max", "min"):
            raise ValueError(f"mode must be 'max' or 'min', got {mode!r}")
        self.lr = float(lr)
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best = float("-inf") if mode == "max" else float("inf")
        self.num_bad_epochs = 0

    def _is_better(self, metric: float) -> bool:
        # Exactly torch's _is_better for threshold_mode='rel' — including
        # its behavior for NEGATIVE best values (no sign special-casing:
        # max-mode bound is always best*(1+threshold), which for best<0 is
        # slightly below best). Fuzz-verified against torch across signs,
        # ties and patience values in test_training_dynamics_parity.py.
        if self.mode == "max":
            return metric > self.best * (1.0 + self.threshold)
        return metric < self.best * (1.0 - self.threshold)

    def step(self, metric: float) -> float:
        """Record one epoch's metric; returns the (possibly reduced) LR."""
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.num_bad_epochs = 0
        return self.lr

    def state_dict(self):
        return dict(lr=self.lr, best=self.best, num_bad_epochs=self.num_bad_epochs)

    def load_state_dict(self, s):
        self.lr, self.best, self.num_bad_epochs = s["lr"], s["best"], s["num_bad_epochs"]


def noam_schedule(model_size: int, factor: float, warmup: int):
    """Noam (Transformer warmup) LR schedule — the reference ships it as a
    defined-but-unused optimizer wrapper (utils_phy12.py:515-544, NoamOpt):
    lr(step) = factor * d_model^-0.5 * min(step^-0.5, step * warmup^-1.5).

    Returns an optax-compatible schedule fn of the 0-based update count;
    the reference's step counter is 1-based, so we shift by one.
    """
    import jax.numpy as jnp

    def schedule(count):
        step = jnp.asarray(count, jnp.float32) + 1.0
        return factor * (model_size ** -0.5) * jnp.minimum(
            step ** -0.5, step * warmup ** -1.5)
    return schedule
