"""Host-offloaded fp32 EMA shadow for single-chip training.

On one 16 GB v5e the fp32 EMA shadow of the 0.87B UNet (+3.5 GB) does
not fit next to the adafactor train step: TRAIN_r04.json records the
on-device EMA tier needing 20.2 GB vs 15.75 GB HBM. On a pod the answer
is dp-sharded optimizer/EMA state (parallel/ meshes); on ONE chip the
shadow moves to HOST memory and its update overlaps device compute:

    dispatch step N+1           (device busy)
    fold()                      host folds the params staged after step N
    stage(new_params)           async D2H, lands when step N+1 completes

``fold()`` blocks until the staged transfer finishes, so calling it
*before* the next dispatch is also safe when the train step donates its
input state (scripts/train_step_chip.py): by the time the buffer is
donated, the D2H copy has retired.

The host math is the same fp32 update as the in-step device EMA
(trainer.py ``train_step``): ``e <- d*e + (1-d)*p``. The shadow is
deliberately fp32 — see the TrainConfig.ema_decay note on why a bf16
shadow silently freezes at decay 0.999.

The reference ships no training loop at all (SURVEY §1: inference-only);
this subsystem is beyond-reference capability.
"""

from __future__ import annotations

import jax
import numpy as np


class HostEMA:
    """fp32 EMA shadow in host memory, fed by async device-to-host copies.

    ``update_every=k`` applies the standard spaced-update approximation
    ``e <- d^k * e + (1 - d^k) * p`` every k-th step — equivalent to the
    per-step EMA when params drift slowly, at 1/k the transfer cost.
    """

    def __init__(self, params, decay: float, update_every: int = 1):
        if not 0.0 < decay < 1.0:
            raise ValueError(f"decay must be in (0, 1), got {decay}")
        if update_every < 1:
            raise ValueError(f"update_every must be >= 1, got {update_every}")
        self.update_every = int(update_every)
        self.decay = float(decay) ** self.update_every
        # synchronous pull at init (one-time 4 bytes/param); np.array copies
        # through the d4dmem allocator when utils.jax_setup.setup() ran
        self.shadow = [
            np.array(p, dtype=np.float32) for p in jax.tree.leaves(params)
        ]
        self.treedef = jax.tree.structure(params)
        self._staged: list | None = None

    def should_update(self, step: int) -> bool:
        return step % self.update_every == 0

    def stage(self, params) -> None:
        """Start async D2H copies of ``params``; fold() consumes them."""
        leaves = jax.tree.leaves(params)
        if len(leaves) != len(self.shadow):
            raise ValueError(
                f"param tree changed: {len(leaves)} leaves vs "
                f"{len(self.shadow)} in the shadow"
            )
        for leaf in leaves:
            try:
                leaf.copy_to_host_async()
            except Exception:  # noqa: BLE001 — backend may not support it;
                break  # fold()'s np.asarray then pays the sync transfer
        self._staged = leaves

    def fold(self) -> None:
        """Fold the staged params into the shadow (blocks on the D2H)."""
        if self._staged is None:
            return
        d = self.decay
        for e, p in zip(self.shadow, self._staged):
            pn = np.asarray(p, dtype=np.float32)  # waits for the async copy
            e *= d
            e += (1.0 - d) * pn
        self._staged = None

    def materialize(self):
        """The shadow as a pytree matching the source params (live arrays —
        callers that keep it across further updates must copy)."""
        return jax.tree.unflatten(self.treedef, self.shadow)

    def load(self, tree) -> None:
        """Replace the shadow from a restored checkpoint tree."""
        leaves = jax.tree.leaves(tree)
        if len(leaves) != len(self.shadow):
            raise ValueError("restored EMA tree does not match the shadow")
        self.shadow = [np.array(x, dtype=np.float32) for x in leaves]
        self._staged = None

    @property
    def nbytes(self) -> int:
        return sum(e.nbytes for e in self.shadow)
