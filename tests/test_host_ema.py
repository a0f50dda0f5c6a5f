"""Host-offloaded EMA (training/ema.py): equivalence to the on-device
EMA, spaced-update decay, and checkpoint/resume through the loop's
state tree. The host shadow is the single-chip fit for EMA training —
the on-device fp32 shadow provably does not fit next to the 0.87B
12-frame train step (TRAIN_r04.json ema tier: 20.2 GB vs 15.75 GB)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffuman4d_tpu.models.unet import UNetConfig, UNetMultiviewCondition
from diffuman4d_tpu.schedulers.diffusion import Scheduler, SchedulerConfig
from diffuman4d_tpu.training.ema import HostEMA
from diffuman4d_tpu.training.trainer import (
    TrainConfig,
    create_train_state,
    make_train_step,
)


def _tiny_unet_params():
    cfg = UNetConfig(
        in_channels=11, block_out_channels=(8, 16),
        num_attention_heads=(1, 2), layers_per_block=1,
        norm_num_groups=4, num_3d_attn_blocks=1,
    )
    unet = UNetMultiviewCondition(cfg, dtype=jnp.float32,
                                  attn_implementation="xla")
    params = unet.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 11)),
        jnp.zeros((2,), jnp.int32), jnp.zeros((2, 64, 64, 3)),
        num_frames=2,
    )
    return unet, params


def _batch():
    B, L, hw = 1, 4, 8
    return {
        "latents_x0": jnp.ones((B, L, hw, hw, 4)) * 0.1,
        "plucker": jnp.zeros((B, L, hw, hw, 6)),
        "skeletons": jnp.zeros((B, L, hw * 8, hw * 8, 3)),
        "is_cond": jnp.asarray([[True, True, False, False]]),
    }


class TestHostEMA:
    def test_matches_device_ema(self):
        """Same seeds, same batch: the host shadow after N steps must match
        the on-device EMA to fp32 tolerance (identical update math, host
        numpy vs jit)."""
        unet, params = _tiny_unet_params()
        batch = _batch()
        sched = Scheduler(SchedulerConfig())

        def run(ema_host: bool):
            tcfg = TrainConfig(learning_rate=1e-3, remat=False,
                               ema_decay=0.9, ema_host=ema_host)
            state = create_train_state(params, tcfg)
            step = jax.jit(make_train_step(unet, sched, tcfg))
            hema = HostEMA(state.params["params"], 0.9) if ema_host else None
            for i in range(4):
                if hema is not None:
                    hema.fold()  # previous step's staged params
                state, _ = step(state, batch, jax.random.PRNGKey(i))
                if hema is not None:
                    hema.stage(state.params["params"])
            if hema is not None:
                hema.fold()
                return state, jax.tree.leaves(hema.materialize())
            return state, jax.tree.leaves(state.ema_params)

        state_dev, ema_dev = run(False)
        state_host, ema_host = run(True)
        assert state_host.ema_params is None  # no HBM shadow in host mode
        # param trajectories are EMA-independent, hence identical
        for a, b in zip(jax.tree.leaves(state_dev.params),
                        jax.tree.leaves(state_host.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(ema_dev, ema_host):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-6, atol=1e-7
            )
        # and the shadow genuinely lags the live params
        assert not np.allclose(
            np.asarray(jax.tree.leaves(state_host.params["params"])[0]),
            ema_host[0],
        )

    def test_spaced_updates_adjust_decay(self):
        """update_every=k folds with d^k — the standard spaced-EMA
        correction — and should_update gates the cadence."""
        params = {"w": jnp.ones((4, 4))}
        ema = HostEMA(params, 0.9, update_every=3)
        np.testing.assert_allclose(ema.decay, 0.9**3)
        assert [ema.should_update(s) for s in range(4)] == [
            True, False, False, True,
        ]
        ema.stage({"w": jnp.zeros((4, 4))})
        ema.fold()
        np.testing.assert_allclose(ema.shadow[0], 0.9**3)
        # fold without a stage is a no-op
        ema.fold()
        np.testing.assert_allclose(ema.shadow[0], 0.9**3)

    def test_materialize_load_roundtrip(self):
        params = {"a": jnp.full((3,), 2.0), "b": jnp.full((2, 2), -1.0)}
        ema = HostEMA(params, 0.5)
        ema.stage({"a": jnp.zeros((3,)), "b": jnp.zeros((2, 2))})
        ema.fold()
        tree = ema.materialize()
        ema2 = HostEMA(params, 0.5)
        ema2.load(tree)
        for a, b in zip(ema.shadow, ema2.shadow):
            np.testing.assert_array_equal(a, b)

    def test_state_tree_checkpoint_resume(self, tmp_path):
        """The loop's state tree carries the host shadow; restore loads it
        back into a fresh HostEMA (loop.py _state_to_tree/_restore_state)."""
        from diffuman4d_tpu.io.checkpoints import save_native
        from diffuman4d_tpu.training.loop import (
            _latest_state_dir, _restore_state, _state_to_tree,
        )

        unet, params = _tiny_unet_params()
        tcfg = TrainConfig(learning_rate=1e-3, remat=False,
                           ema_decay=0.9, ema_host=True)
        state = create_train_state(params, tcfg)
        step = jax.jit(make_train_step(unet, Scheduler(SchedulerConfig()), tcfg))
        hema = HostEMA(state.params["params"], 0.9)
        batch = _batch()
        for i in range(2):
            hema.fold()
            state, metrics = step(state, batch, jax.random.PRNGKey(i))
            hema.stage(state.params["params"])
        hema.fold()

        out = str(tmp_path / "run")
        save_native(out + "/state_0000002", _state_to_tree(state, hema))
        latest = _latest_state_dir(out)

        fresh = create_train_state(params, tcfg)
        hema2 = HostEMA(fresh.params["params"], 0.9)
        restored = _restore_state(latest, fresh, hema2)
        assert int(restored.step) == 2
        assert restored.ema_params is None
        for a, b in zip(hema.shadow, hema2.shadow):
            np.testing.assert_array_equal(a, b)
        # restored state steps further, and the restored shadow keeps folding
        restored, m2 = step(restored, batch, jax.random.PRNGKey(9))
        hema2.stage(restored.params["params"])
        hema2.fold()
        assert int(m2["step"]) == 3
