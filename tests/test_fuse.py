"""Serving-time projection fusion: fused layout must be numerically
identical to the canonical layout for inference and text generation, and
must refuse un-merged LoRA / quantized trees."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from open_pi_zero_tpu.config import LoraConfig, dataclass_replace, tiny_pizero_config
from open_pi_zero_tpu.models import fuse, pizero
from open_pi_zero_tpu.ops import lora as lora_lib


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_pizero_config(num_inference_steps=2)
    params = pizero.init_params(jax.random.key(0), cfg)
    ids = jnp.zeros((1, cfg.max_image_text_tokens), jnp.int32)
    ids = ids.at[:, : cfg.siglip.num_image_tokens].set(cfg.image_token_index)
    ids = ids.at[:, cfg.siglip.num_image_tokens].set(2)
    am = (ids != 0).astype(jnp.int32)
    img = jnp.asarray(np.random.default_rng(1).normal(size=(1, 28, 28, 3)), jnp.float32)
    prop = jnp.full((1, 1, cfg.proprio_dim), 0.1)
    return cfg, params, ids, am, img, prop


@pytest.mark.slow
def test_fused_infer_action_identical(setup):
    cfg, params, ids, am, img, prop = setup
    fused = fuse.fuse_for_serving(params)
    assert "qkv" in fused["joint"]["mixtures"]["vlm"]["layers"]["attn"]
    assert "gateup" in fused["joint"]["mixtures"]["vlm"]["layers"]["mlp"]
    rng = jax.random.key(2)
    want = pizero.infer_action(params, cfg, rng, ids, img, am, prop)
    got = pizero.infer_action(fused, cfg, rng, ids, img, am, prop)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_fused_text_generation_identical(setup):
    cfg, params, ids, am, img, prop = setup
    fused = fuse.fuse_for_serving(params)
    want = pizero.generate_text(params, cfg, ids[:, :6], img, max_new_tokens=4)
    got = pizero.generate_text(fused, cfg, ids[:, :6], img, max_new_tokens=4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.slow
def test_prepare_for_serving_int8_expert_close_to_float(setup):
    """Production serving layout (fused + int8 action expert): quantized
    fused kernels must stay close to the float forward, and only the
    requested mixtures are quantized."""
    cfg, params, ids, am, img, prop = setup
    served = fuse.prepare_for_serving(params, quantize_mixtures=("action",))
    attn = served["joint"]["mixtures"]["action"]["layers"]["attn"]
    assert isinstance(attn["qkv"], dict) and "scale" in attn["qkv"]
    vlm_attn = served["joint"]["mixtures"]["vlm"]["layers"]["attn"]
    assert not isinstance(vlm_attn["qkv"], dict)
    rng = jax.random.key(2)
    want = pizero.infer_action(params, cfg, rng, ids, img, am, prop)
    got = pizero.infer_action(served, cfg, rng, ids, img, am, prop)
    drift = float(np.mean(np.abs(np.asarray(got) - np.asarray(want))))
    assert drift < 2.5e-3, f"int8-expert drift {drift} above the reference band"


@pytest.mark.slow
def test_fusion_refuses_lora_and_quantized(setup):
    cfg, params, *_ = setup
    lcfg = dataclass_replace(
        cfg,
        joint=dataclass_replace(
            cfg.joint,
            mixtures=tuple(
                dataclass_replace(m, use_lora=(i == 0), lora=LoraConfig(r=2))
                for i, m in enumerate(cfg.joint.mixtures)
            ),
        ),
    )
    lora_params = pizero.init_params(jax.random.key(0), lcfg)
    with pytest.raises(ValueError, match="LoRA"):
        fuse.fuse_for_serving(lora_params)
    # merged trees fuse fine
    fuse.fuse_for_serving(lora_lib.merge_lora(lora_params))

    qparams = dict(params)
    qparams["joint"] = lora_lib.quantize_base_weights(params["joint"])
    with pytest.raises(ValueError, match="quantized"):
        fuse.fuse_for_serving(qparams)
    q4params = dict(params)
    q4params["joint"] = lora_lib.quantize_base_weights(params["joint"], bits=4)
    with pytest.raises(ValueError, match="quantized"):
        fuse.fuse_for_serving(q4params)


@pytest.mark.slow
def test_prepare_for_serving_nf4_expert_close_to_float(setup):
    """4-bit serving tier (fused + NF4 action expert, the bnb Linear4bit
    analog): bounded drift, only requested mixtures quantized."""
    cfg, params, ids, am, img, prop = setup
    served = fuse.prepare_for_serving(params, quantize_mixtures=("action",), bits=4)
    attn = served["joint"]["mixtures"]["action"]["layers"]["attn"]
    assert isinstance(attn["qkv"], dict) and "q4" in attn["qkv"]
    vlm_attn = served["joint"]["mixtures"]["vlm"]["layers"]["attn"]
    assert not isinstance(vlm_attn["qkv"], dict)
    rng = jax.random.key(2)
    want = pizero.infer_action(params, cfg, rng, ids, img, am, prop)
    got = pizero.infer_action(served, cfg, rng, ids, img, am, prop)
    drift = float(np.mean(np.abs(np.asarray(got) - np.asarray(want))))
    assert drift < 2e-2, f"nf4-expert drift {drift}"


@pytest.mark.slow
def test_prepare_for_serving_w8a8_close_to_float(setup):
    """W8A8 compute tier (native int8 x int8 MXU dots with dynamic
    per-token activation quantization) on the prefill towers: bounded
    drift, payload stored under "qa" so base_matmul takes the native path."""
    cfg, params, ids, am, img, prop = setup
    served = fuse.prepare_for_serving(
        params, w8a8_mixtures=("vlm",), w8a8_siglip=True
    )
    vlm_attn = served["joint"]["mixtures"]["vlm"]["layers"]["attn"]
    assert isinstance(vlm_attn["qkv"], dict) and "qa" in vlm_attn["qkv"]
    act_attn = served["joint"]["mixtures"]["action"]["layers"]["attn"]
    assert not isinstance(act_attn["qkv"], dict)
    sig_attn = served["siglip"]["layers"]["attn"]
    assert "qa" in sig_attn["qkv"]["kernel"]
    # embeddings/projector stay float
    assert not isinstance(served["siglip"]["embeddings"]["patch"]["kernel"], dict)
    rng = jax.random.key(2)
    want = pizero.infer_action(params, cfg, rng, ids, img, am, prop)
    got = jax.jit(
        lambda p, r, i, pv, a, pr: pizero.infer_action(p, cfg, r, i, pv, a, pr)
    )(served, rng, ids, img, am, prop)
    assert np.isfinite(np.asarray(got)).all()
    drift = float(np.mean(np.abs(np.asarray(got) - np.asarray(want))))
    assert drift < 2e-2, f"w8a8 drift {drift}"


@pytest.mark.slow
def test_w8a8_merge_lora_dequantizes_qa(setup):
    """merge_lora must fold adapters into a W8A8 base by dequantizing it."""
    cfg, params, *_ = setup
    qtree = lora_lib.quantize_base_weights(
        params["joint"]["mixtures"]["vlm"], w8a8=True
    )
    qkv = qtree["layers"]["attn"]
    # attach a zero adapter next to q; merge should return a float kernel
    import jax.numpy as jnp

    L, din, dout = qtree["layers"]["attn"]["q"]["qa"].shape
    qkv["q_lora"] = {
        "a": jnp.zeros((L, din, 2), jnp.float32),
        "b": jnp.zeros((L, 2, dout), jnp.float32),
    }
    merged = lora_lib.merge_lora(qtree)
    w = merged["layers"]["attn"]["q"]
    assert not isinstance(w, dict) and w.shape == (L, din, dout)
    ref = params["joint"]["mixtures"]["vlm"]["layers"]["attn"]["q"]
    assert float(jnp.mean(jnp.abs(w - ref))) < 0.01


def test_build_serving_params_bitwise_matches_two_step(setup):
    """The streaming (OOM-proof) builder must be bitwise identical to
    prepare_for_serving(init_params(...)) — same key splits, same module
    init order, interleaved memory management only."""
    cfg, params, *_ = setup
    tiers = dict(
        quantize_mixtures=("action",), w8a8_mixtures=("vlm",), w8a8_siglip=True
    )
    want = fuse.prepare_for_serving(
        pizero.init_params(jax.random.key(7), cfg), **tiers
    )
    got = fuse.build_serving_params(jax.random.key(7), cfg, jnp.float32, **tiers)
    assert jax.tree.structure(got) == jax.tree.structure(want)
    for (pw, w), (pg, g) in zip(
        jax.tree_util.tree_leaves_with_path(want),
        jax.tree_util.tree_leaves_with_path(got),
    ):
        assert pw == pg
        np.testing.assert_array_equal(
            np.asarray(w), np.asarray(g), err_msg=jax.tree_util.keystr(pw)
        )


def test_build_serving_params_bf16_plain(setup):
    """No-quantization path: streaming builder == fuse_for_serving(init)."""
    cfg, *_ = setup
    want = fuse.fuse_for_serving(
        pizero.init_params(jax.random.key(3), cfg, jnp.bfloat16)
    )
    got = fuse.build_serving_params(jax.random.key(3), cfg, jnp.bfloat16)
    for w, g in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))


def test_default_serving_layout_keeps_siglip_bf16(setup):
    """Round-3 drift budget (DRIFT_BUDGET.json): SigLIP W8A8 alone
    contributes 2.6e-3 L1 — the largest share — so the production default
    (EvalAgent, entry()) quantizes the VLM trunk + expert but leaves the
    vision tower bf16, landing mid-band (~1.4e-3). This pins the layout."""
    cfg, params, *_ = setup
    served = fuse.prepare_for_serving(
        params, quantize_mixtures=("action",), w8a8_mixtures=("vlm",),
        w8a8_siglip=False,
    )
    vlm_attn = served["joint"]["mixtures"]["vlm"]["layers"]["attn"]
    assert isinstance(vlm_attn["qkv"], dict) and "qa" in vlm_attn["qkv"]
    act_attn = served["joint"]["mixtures"]["action"]["layers"]["attn"]
    assert isinstance(act_attn["qkv"], dict) and "q" in act_attn["qkv"]
    sig_attn = served["siglip"]["layers"]["attn"]
    assert not isinstance(sig_attn["qkv"]["kernel"], dict)  # bf16 tower


def test_serving_layout_kwargs_resolution():
    """fuse.serving_layout_kwargs is the single source of truth for the
    eval-config tier knobs, shared by EvalAgent._load_params,
    scripts/serve.py --random-init, and the benches."""
    # production defaults: int8 expert + W8A8 vlm, SigLIP bf16
    kw = fuse.serving_layout_kwargs({})
    assert kw["quantize_mixtures"] == ("action",)
    assert kw["w8a8_mixtures"] == ("vlm",)
    assert kw["bits"] == 8 and kw["w8a8_siglip"] is False
    # min-latency opt-in tier
    kw = fuse.serving_layout_kwargs({"w8a8_siglip": True})
    assert kw["w8a8_siglip"] is True
    # w8a8=false drops the prefill tier entirely (incl. siglip)
    kw = fuse.serving_layout_kwargs({"w8a8": False, "w8a8_siglip": True})
    assert kw["w8a8_mixtures"] == () and kw["w8a8_siglip"] is False
    # quantize=false = pure fused bf16 (no kwargs at all)
    assert fuse.serving_layout_kwargs({"quantize": False}) == {}
    # NF4 memory tier
    kw = fuse.serving_layout_kwargs({"quantize_bits": 4})
    assert kw["bits"] == 4 and kw["code"] == "nf4"
