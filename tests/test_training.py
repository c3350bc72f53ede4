"""Training-stack tests: schedule golden values vs an independent
implementation of the reference formula, freeze surgery, 8-bit Adam,
EMA/SWA, flow-time sampling, and a sharded end-to-end train step on the
8-device virtual CPU mesh."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from open_pi_zero_tpu.config import (
    LRSchedulerConfig,
    TrainingConfig,
    tiny_pizero_config,
)
from open_pi_zero_tpu.models import pizero
from open_pi_zero_tpu.ops.quantization import (
    dequantize_blockwise,
    quantize_blockwise,
)
from open_pi_zero_tpu.parallel import make_mesh, shard_batch
from open_pi_zero_tpu.training import averaging as avg_lib
from open_pi_zero_tpu.training import optimizer as opt_lib
from open_pi_zero_tpu.training import schedules
from open_pi_zero_tpu.training.quantized_adam import adamw8bit
from open_pi_zero_tpu.training.sampling import sample_flow_time
from open_pi_zero_tpu.training.train_step import (
    init_train_state,
    make_jitted_train_step,
    make_train_step,
)


def ref_scheduler_lr(step, max_lr, min_lr, first_cycle, warmup):
    """Independent impl of the reference CosineAnnealingWarmupRestarts
    (src/utils/optim.py:92-112) for cycle_mult=gamma=1."""
    step_in_cycle = step % first_cycle
    if step_in_cycle < warmup:
        return (max_lr - min_lr) * step_in_cycle / warmup + min_lr
    return min_lr + (max_lr - min_lr) * (
        1 + math.cos(math.pi * (step_in_cycle - warmup) / (first_cycle - warmup))
    ) / 2


def test_schedule_matches_reference_formula():
    sched = schedules.cosine_annealing_warmup_restarts(
        max_lr=5e-5, first_cycle_steps=1000, min_lr=1e-8, warmup_steps=200
    )
    for step in [0, 1, 100, 199, 200, 500, 999, 1000, 1200, 2500]:
        expected = ref_scheduler_lr(step, 5e-5, 1e-8, 1000, 200)
        np.testing.assert_allclose(float(sched(step)), expected, rtol=1e-4, atol=1e-12)


def _tiny_setup(train_vlm=True, quantize=False):
    cfg = tiny_pizero_config()
    params = pizero.init_params(jax.random.key(0), cfg)
    tcfg = TrainingConfig(
        train_vlm=train_vlm,
        quantize_optimizer_states=quantize,
        action_lr_scheduler=LRSchedulerConfig(first_cycle_steps=100, warmup_steps=5),
        vlm_lr_scheduler=LRSchedulerConfig(first_cycle_steps=100, warmup_steps=5),
    )
    return cfg, params, tcfg


def _tiny_batch(cfg, b=2, accum=None):
    rng = np.random.default_rng(0)
    S, n_img = cfg.max_image_text_tokens, cfg.siglip.num_image_tokens
    ids = np.zeros((b, S), np.int32)
    ids[:, :n_img] = cfg.image_token_index
    ids[:, n_img : n_img + 2] = 5
    batch = {
        "input_ids": jnp.asarray(ids),
        "pixel_values": jnp.asarray(
            rng.normal(size=(b, cfg.siglip.image_size, cfg.siglip.image_size, 3)),
            jnp.float32,
        ),
        "attention_mask": jnp.asarray((ids != 0).astype(np.int32)),
        "proprios": jnp.asarray(
            rng.normal(size=(b, cfg.cond_steps, cfg.proprio_dim)), jnp.float32
        ),
        "actions": jnp.asarray(
            rng.normal(size=(b, cfg.horizon_steps, cfg.action_dim)).clip(-1, 1),
            jnp.float32,
        ),
    }
    if accum:
        batch = jax.tree.map(
            lambda x: jnp.stack([x] * accum), batch
        )
    return batch


class TestFreezeSurgery:
    @pytest.mark.slow
    def test_frozen_leaves_do_not_move(self):
        cfg, params, tcfg = _tiny_setup()
        tx = opt_lib.build_optimizer(tcfg, params)
        state = tx.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        new = optax.apply_updates(params, updates)
        # embed_tokens frozen
        np.testing.assert_array_equal(
            np.asarray(new["embed_tokens"]), np.asarray(params["embed_tokens"])
        )
        # vlm last-layer unused slices frozen, earlier layers move
        vlm_o_old = np.asarray(params["joint"]["mixtures"]["vlm"]["layers"]["attn"]["o"])
        vlm_o_new = np.asarray(new["joint"]["mixtures"]["vlm"]["layers"]["attn"]["o"])
        np.testing.assert_array_equal(vlm_o_new[-1], vlm_o_old[-1])
        assert np.abs(vlm_o_new[0] - vlm_o_old[0]).max() > 0
        # k_proj of last layer IS trained (used by action attention)
        vlm_k_old = np.asarray(params["joint"]["mixtures"]["vlm"]["layers"]["attn"]["k"])
        vlm_k_new = np.asarray(new["joint"]["mixtures"]["vlm"]["layers"]["attn"]["k"])
        assert np.abs(vlm_k_new[-1] - vlm_k_old[-1]).max() > 0
        # action expert moves
        a_old = np.asarray(params["action_decoder"]["kernel"])
        a_new = np.asarray(new["action_decoder"]["kernel"])
        assert np.abs(a_new - a_old).max() > 0

    def test_train_vlm_false_freezes_whole_vlm(self):
        cfg, params, tcfg = _tiny_setup(train_vlm=False)
        tx = opt_lib.build_optimizer(tcfg, params)
        state = tx.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        new = optax.apply_updates(params, updates)
        for sub in ("siglip", "projector"):
            for old, nw in zip(jax.tree.leaves(params[sub]), jax.tree.leaves(new[sub])):
                np.testing.assert_array_equal(np.asarray(old), np.asarray(nw))
        assert (
            np.abs(
                np.asarray(new["action_decoder"]["kernel"])
                - np.asarray(params["action_decoder"]["kernel"])
            ).max()
            > 0
        )

    def test_param_counts(self):
        cfg, params, _ = _tiny_setup()
        counts = opt_lib.trainable_param_count(params)
        total = sum(x.size for x in jax.tree.leaves(params))
        assert abs(sum(counts.values()) * 1e9 - total) < 1


class TestQuantizedAdam:
    def test_blockwise_roundtrip(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(3, 1000)).astype(np.float32) * 10
        qt = quantize_blockwise(jnp.asarray(x), block=256)
        back = np.asarray(dequantize_blockwise(qt))
        assert back.shape == x.shape
        # error bounded by scale/127 per block
        err = np.abs(back - x)
        assert err.max() <= np.abs(x).max() / 127.0 + 1e-6

    def test_adamw8bit_tracks_adamw(self):
        """On a quadratic bowl the int8-state AdamW must follow fp32 AdamW."""
        target = jnp.asarray(np.random.default_rng(2).normal(size=(300,)), jnp.float32)

        def loss(p):
            return jnp.sum((p - target) ** 2)

        def run(tx, steps=60):
            p = jnp.zeros_like(target)
            s = tx.init(p)
            for _ in range(steps):
                g = jax.grad(loss)(p)
                u, s = tx.update(g, s, p)
                p = optax.apply_updates(p, u)
            return p

        p8 = run(adamw8bit(1e-1, block=64))
        p32 = run(optax.adamw(1e-1))
        np.testing.assert_allclose(np.asarray(p8), np.asarray(p32), atol=0.05)

    @pytest.mark.slow
    def test_full_optimizer_with_quantized_states(self):
        cfg, params, tcfg = _tiny_setup(quantize=True)
        tx = opt_lib.build_optimizer(tcfg, params)
        state = tx.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, state = tx.update(grads, state, params)
        new = optax.apply_updates(params, updates)
        np.testing.assert_array_equal(
            np.asarray(new["embed_tokens"]), np.asarray(params["embed_tokens"])
        )
        assert np.isfinite(
            np.asarray(new["action_decoder"]["kernel"])
        ).all()


class TestAveraging:
    def test_ema(self):
        tcfg = TrainingConfig(use_ema=True, ema_decay=0.9, ema_start=2, ema_freq=1)
        params = {"w": jnp.asarray(1.0)}
        st = avg_lib.init_averaging(params)
        # update 1: before start -> untouched
        st = avg_lib.maybe_update(st, params, jnp.asarray(1), tcfg)
        assert int(st.n_averaged) == 0
        # update 2: first snapshot initializes to params
        st = avg_lib.maybe_update(st, params, jnp.asarray(2), tcfg)
        assert int(st.n_averaged) == 1
        np.testing.assert_allclose(float(st.avg_params["w"]), 1.0)
        # update 3 with params=2 -> 0.9*1 + 0.1*2 = 1.1
        st = avg_lib.maybe_update(st, {"w": jnp.asarray(2.0)}, jnp.asarray(3), tcfg)
        np.testing.assert_allclose(float(st.avg_params["w"]), 1.1, rtol=1e-6)
        out = avg_lib.eval_params(st, {"w": jnp.asarray(5.0)})
        np.testing.assert_allclose(float(out["w"]), 1.1, rtol=1e-6)

    def test_swa_is_running_mean(self):
        tcfg = TrainingConfig(use_swa=True, swa_start=0, swa_freq=1)
        st = avg_lib.init_averaging({"w": jnp.asarray(0.0)})
        for i, v in enumerate([1.0, 2.0, 3.0]):
            st = avg_lib.maybe_update(st, {"w": jnp.asarray(v)}, jnp.asarray(i), tcfg)
        np.testing.assert_allclose(float(st.avg_params["w"]), 2.0, rtol=1e-6)


class TestFlowTimeSampling:
    def test_uniform_stratified(self):
        cfg = tiny_pizero_config(flow_sampling="uniform")
        t = np.asarray(sample_flow_time(jax.random.key(0), 64, cfg))
        assert t.shape == (64,)
        assert (t >= 0).all() and (t < 1).all()
        # stratified: sorted diffs ~ 1/bsz
        d = np.diff(np.sort(t))
        assert d.max() < 2.5 / 64

    def test_beta_shifted(self):
        cfg = tiny_pizero_config(flow_sampling="beta")
        t = np.asarray(sample_flow_time(jax.random.key(0), 4096, cfg))
        assert (t >= 0).all() and (t <= 1 - cfg.flow_sig_min + 1e-6).all()
        # Beta(1.5,1) flipped emphasizes small t: mean = (1-σ)(1-0.6) = 0.4ish
        assert 0.35 < t.mean() < 0.45


@pytest.mark.slow
class TestTrainStep:
    def test_single_device_step_decreases_loss(self):
        cfg, params, tcfg = _tiny_setup()
        tx = opt_lib.build_optimizer(tcfg, params)
        state = init_train_state(params, tx, jax.random.key(0), tcfg)
        step = jax.jit(make_train_step(cfg, tcfg, tx))
        batch = _tiny_batch(cfg)
        losses = []
        for _ in range(8):
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert int(state.step) == 8

    def test_grad_accumulation_averages_microbatch_grads(self):
        """The scan accumulation must produce the mean of per-microbatch
        grads (checked against a manual average with the same rngs)."""
        cfg, params, tcfg = _tiny_setup()
        from open_pi_zero_tpu.training.train_step import batch_loss

        tx = opt_lib.build_optimizer(tcfg, params)
        step = jax.jit(make_train_step(cfg, tcfg, tx, grad_accum=2))
        state = init_train_state(params, tx, jax.random.key(0), tcfg)
        batch = _tiny_batch(cfg, b=2, accum=2)

        # replicate the step's rng plumbing to compute the expected loss
        _, sub = jax.random.split(state.rng)
        subs = jax.random.split(sub, 2)
        l0 = batch_loss(params, cfg, subs[0], jax.tree.map(lambda x: x[0], batch))
        l1 = batch_loss(params, cfg, subs[1], jax.tree.map(lambda x: x[1], batch))
        state, m = step(state, batch)
        np.testing.assert_allclose(
            float(m["loss"]), (float(l0) + float(l1)) / 2, rtol=1e-5
        )

    def test_mesh_sharded_step(self):
        """DP over the 8-device virtual CPU mesh (SURVEY.md §2.6 plan)."""
        cfg, params, tcfg = _tiny_setup()
        mesh = make_mesh(n_data=8)
        tx = opt_lib.build_optimizer(tcfg, params)
        state = init_train_state(params, tx, jax.random.key(0), tcfg)
        step = make_jitted_train_step(cfg, tcfg, tx, mesh=mesh)
        batch = shard_batch(mesh, _tiny_batch(cfg, b=8))
        state, m = step(state, batch)
        assert np.isfinite(float(m["loss"]))
        state, m2 = step(state, batch)
        assert np.isfinite(float(m2["loss"]))
        assert int(state.step) == 2


@pytest.mark.slow
class TestZero1:
    def test_zero1_matches_replicated(self):
        """ZeRO-1 sharded optimizer states produce identical training to the
        replicated baseline, and the states really are sharded."""
        import numpy as np
        from jax.sharding import PartitionSpec as P

        from open_pi_zero_tpu.config import TrainingConfig, tiny_pizero_config
        from open_pi_zero_tpu.models import pizero
        from open_pi_zero_tpu.parallel import make_mesh, replicate, shard_batch
        from open_pi_zero_tpu.training import optimizer as opt_lib
        from open_pi_zero_tpu.training.train_step import (
            init_train_state,
            make_jitted_train_step,
            shard_state_zero1,
            zero1_state_sharding,
        )

        cfg = tiny_pizero_config()
        tcfg = TrainingConfig(use_ema=True, ema_start=0)
        mesh = make_mesh(n_data=8)
        params = pizero.init_params(jax.random.key(0), cfg)
        tx = opt_lib.build_optimizer(tcfg, params)

        ids = np.zeros((8, cfg.max_image_text_tokens), np.int32)
        ids[:, : cfg.siglip.num_image_tokens] = cfg.image_token_index
        batch = {
            "input_ids": jnp.asarray(ids),
            "pixel_values": jnp.zeros((8, 28, 28, 3)),
            "attention_mask": jnp.asarray((ids != 0).astype(np.int32)),
            "proprios": jnp.zeros((8, 1, cfg.proprio_dim)),
            "actions": jnp.zeros((8, cfg.horizon_steps, cfg.action_dim)),
        }
        batch = shard_batch(mesh, batch)

        # replicated baseline
        s0 = replicate(mesh, init_train_state(params, tx, jax.random.key(1), tcfg))
        step_rep = make_jitted_train_step(cfg, tcfg, tx, mesh)
        s0, m0 = step_rep(s0, batch)

        # zero-1
        params2 = pizero.init_params(jax.random.key(0), cfg)
        s1 = init_train_state(params2, tx, jax.random.key(1), tcfg)
        s1 = shard_state_zero1(s1, mesh)
        sharding = zero1_state_sharding(s1, mesh)
        step_z = make_jitted_train_step(cfg, tcfg, tx, mesh, state_sharding=sharding)
        s1, m1 = step_z(s1, batch)

        np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]), rtol=1e-6)
        chex = jax.tree.leaves(s0.params), jax.tree.leaves(s1.params)
        for a, b in zip(*chex):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
        # the big moment buffers actually live sharded
        big = [
            x for x in jax.tree.leaves(s1.opt_state)
            if hasattr(x, "sharding") and x.ndim >= 2 and x.size > 1000
        ]
        assert any(x.sharding.spec != P() for x in big), "no opt leaf sharded"


@pytest.mark.slow
def test_remat_preserves_loss_and_grads():
    """joint remat (jax.checkpoint over trunk layers) must not change the
    flow loss or its gradients."""
    import numpy as np

    from open_pi_zero_tpu.config import dataclass_replace, tiny_pizero_config
    from open_pi_zero_tpu.models import pizero

    cfg = tiny_pizero_config()
    cfg_r = dataclass_replace(cfg, joint=dataclass_replace(cfg.joint, remat=True))
    params = pizero.init_params(jax.random.key(0), cfg)

    ids = jnp.zeros((2, cfg.max_image_text_tokens), jnp.int32)
    ids = ids.at[:, : cfg.siglip.num_image_tokens].set(cfg.image_token_index)
    am = (ids != 0).astype(jnp.int32)
    img = jnp.zeros((2, 28, 28, 3))
    prop = jnp.zeros((2, 1, cfg.proprio_dim))
    act = jnp.full((2, cfg.horizon_steps, cfg.action_dim), 0.3)
    t = jnp.asarray([0.2, 0.8])

    def loss(c):
        return lambda p: pizero.flow_matching_loss(
            p, c, jax.random.key(1), ids, img, am, prop, act, t
        )

    l0, g0 = jax.value_and_grad(loss(cfg))(params)
    l1, g1 = jax.value_and_grad(loss(cfg_r))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
class TestQLoRATraining:
    """QLoRA: NF4 frozen base + trainable adapters through the real train
    step (reference quantize+lora tiers, src/model/lora.py:83-100; TrainAgent
    wires this from the configs' `quantize`/`lora` flags)."""

    def test_step_trains_adapters_only_with_quantized_base(self):
        from open_pi_zero_tpu.config import LoraConfig, dataclass_replace
        from open_pi_zero_tpu.ops import lora as lora_lib
        from open_pi_zero_tpu.training.train_step import (
            init_train_state,
            make_jitted_train_step,
        )

        cfg = tiny_pizero_config()
        mixtures = tuple(
            dataclass_replace(m, use_lora=(name == "vlm"), lora=LoraConfig(r=2))
            for name, m in zip(cfg.joint.mixture_names, cfg.joint.mixtures)
        )
        cfg = dataclass_replace(
            cfg, joint=dataclass_replace(cfg.joint, mixtures=mixtures)
        )
        params = pizero.init_params(jax.random.key(0), cfg)
        joint = dict(params["joint"])
        joint["mixtures"] = {
            **joint["mixtures"],
            "vlm": lora_lib.quantize_base_weights(joint["mixtures"]["vlm"], bits=4),
        }
        params = {**params, "joint": joint}
        vlm_attn = params["joint"]["mixtures"]["vlm"]["layers"]["attn"]
        assert "q4" in vlm_attn["q"] and "q_lora" in vlm_attn

        tcfg = TrainingConfig(
            lora=True,
            use_ema=True,
            ema_start=0,
            action_lr_scheduler=LRSchedulerConfig(first_cycle_steps=100, warmup_steps=0),
            vlm_lr_scheduler=LRSchedulerConfig(first_cycle_steps=100, warmup_steps=0),
        )
        tx = opt_lib.build_optimizer(tcfg, params)
        state = init_train_state(params, tx, jax.random.key(1), tcfg)
        step = make_jitted_train_step(cfg, tcfg, tx)
        batch = _tiny_batch(cfg)

        q4_before = np.asarray(vlm_attn["q"]["q4"]).copy()
        lora_b_before = np.asarray(vlm_attn["q_lora"]["b"]).copy()
        for _ in range(2):
            state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        attn_after = state.params["joint"]["mixtures"]["vlm"]["layers"]["attn"]
        # frozen NF4 payload is bit-identical; adapters moved
        np.testing.assert_array_equal(np.asarray(attn_after["q"]["q4"]), q4_before)
        assert float(np.abs(np.asarray(attn_after["q_lora"]["b"]) - lora_b_before).sum()) > 0
        # action expert still trains fully
        assert float(metrics["grad_norm"]) > 0
        # EMA tree kept the integer payloads intact
        assert state.avg.avg_params["joint"]["mixtures"]["vlm"]["layers"]["attn"]["q"]["q4"].dtype == jnp.uint8


@pytest.mark.slow
def test_qlora_zero1_remat_pod_recipe():
    """The realistic pod fine-tune combo: QLoRA (NF4 frozen vlm base +
    adapters) + ZeRO-1 optimizer-state sharding + per-layer remat + int8
    optimizer states on an 8-device mesh — one jitted step must run with
    finite loss and keep the quantized payloads bit-identical."""
    import numpy as np
    from open_pi_zero_tpu.config import LoraConfig, dataclass_replace
    from open_pi_zero_tpu.ops import lora as lora_lib
    from open_pi_zero_tpu.parallel import make_mesh, shard_batch
    from open_pi_zero_tpu.training.train_step import (
        init_train_state,
        make_jitted_train_step,
        shard_state_zero1,
        zero1_state_sharding,
    )

    cfg = tiny_pizero_config()
    mixtures = tuple(
        dataclass_replace(
            m,
            use_lora=(name == "vlm"),
            use_quantize=(name == "vlm"),
            lora=LoraConfig(r=2),
        )
        for name, m in zip(cfg.joint.mixture_names, cfg.joint.mixtures)
    )
    cfg = dataclass_replace(
        cfg, joint=dataclass_replace(cfg.joint, mixtures=mixtures, remat=True)
    )
    params = pizero.init_params(jax.random.key(0), cfg)
    params = lora_lib.quantize_per_model_config(params, cfg)
    assert "q4" in params["joint"]["mixtures"]["vlm"]["layers"]["attn"]["q"]

    tcfg = TrainingConfig(
        lora=True,
        quantize_optimizer_states=True,
        use_ema=True,
        ema_start=0,
        action_lr_scheduler=LRSchedulerConfig(first_cycle_steps=100, warmup_steps=0),
        vlm_lr_scheduler=LRSchedulerConfig(first_cycle_steps=100, warmup_steps=0),
    )
    mesh = make_mesh(n_data=8)
    tx = opt_lib.build_optimizer(tcfg, params)
    state = init_train_state(params, tx, jax.random.key(1), tcfg)
    state = shard_state_zero1(state, mesh)
    sharding = zero1_state_sharding(state, mesh)

    ids = np.zeros((8, cfg.max_image_text_tokens), np.int32)
    ids[:, : cfg.siglip.num_image_tokens] = cfg.image_token_index
    batch = shard_batch(mesh, {
        "input_ids": jnp.asarray(ids),
        "pixel_values": jnp.zeros((8, 28, 28, 3)),
        "attention_mask": jnp.asarray((ids != 0).astype(np.int32)),
        "proprios": jnp.zeros((8, 1, cfg.proprio_dim)),
        "actions": jnp.zeros((8, cfg.horizon_steps, cfg.action_dim)),
    })
    step = make_jitted_train_step(cfg, tcfg, tx, mesh, state_sharding=sharding)
    q4_before = np.asarray(
        params["joint"]["mixtures"]["vlm"]["layers"]["attn"]["q"]["q4"]
    ).copy()
    state, metrics = step(state, batch)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    q4_after = np.asarray(
        state.params["joint"]["mixtures"]["vlm"]["layers"]["attn"]["q"]["q4"]
    )
    np.testing.assert_array_equal(q4_after, q4_before)
