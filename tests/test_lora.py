"""LoRA + int8 quantization: zero-init equivalence, delta math golden,
merge == unmerged forward, label/extract tree transforms, quantized-base
accuracy, and an end-to-end model check (LoRA-enabled vlm mixture leaves
the function unchanged at init; merge_lora reproduces trained adapters)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from open_pi_zero_tpu.config import (
    LoraConfig,
    MixtureConfig,
    dataclass_replace,
    tiny_pizero_config,
)
from open_pi_zero_tpu.models import pizero
from open_pi_zero_tpu.ops import lora as lora_lib


def test_lora_init_starts_at_identity():
    key = jax.random.key(0)
    lp = {"w": jax.random.normal(key, (8, 16)), "w_lora": lora_lib.lora_init(key, 8, 16, 4)}
    x = jax.random.normal(jax.random.key(1), (3, 8))
    np.testing.assert_allclose(
        np.asarray(lora_lib.proj(lp, "w", x)),
        np.asarray(x @ lp["w"]),
        rtol=1e-6,
    )


def test_lora_delta_golden():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(8, 4)).astype(np.float32)
    b = rng.normal(size=(4, 16)).astype(np.float32)
    x = rng.normal(size=(2, 8)).astype(np.float32)
    got = lora_lib.lora_delta(jnp.asarray(x), {"a": jnp.asarray(a), "b": jnp.asarray(b)}, 0.5)
    np.testing.assert_allclose(np.asarray(got), 0.5 * x @ a @ b, rtol=1e-5)


def test_merge_matches_unmerged_forward():
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    lp = {
        "w": jax.random.normal(k1, (8, 16)),
        "w_lora": {
            "a": jax.random.normal(k2, (8, 4)) * 0.1,
            "b": jax.random.normal(k3, (4, 16)) * 0.1,
        },
    }
    x = jax.random.normal(jax.random.key(4), (5, 8))
    unmerged = lora_lib.proj(lp, "w", x, scaling=1.3)
    merged = lora_lib.merge_lora(lp, scaling=1.3)
    assert "w_lora" not in merged
    np.testing.assert_allclose(
        np.asarray(x @ merged["w"]), np.asarray(unmerged), rtol=1e-4, atol=1e-5
    )


def test_merge_stacked_kernels():
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    lp = {
        "w": jax.random.normal(k1, (3, 8, 16)),  # [L, in, out]
        "w_lora": {
            "a": jax.random.normal(k2, (3, 8, 4)) * 0.1,
            "b": jax.random.normal(k3, (3, 4, 16)) * 0.1,
        },
    }
    merged = lora_lib.merge_lora(lp)
    want = np.asarray(lp["w"]) + np.einsum(
        "lir,lro->lio", np.asarray(lp["w_lora"]["a"]), np.asarray(lp["w_lora"]["b"])
    )
    np.testing.assert_allclose(np.asarray(merged["w"]), want, rtol=1e-5)


def test_labels_and_extract():
    params = {
        "attn": {
            "q": jnp.zeros((2, 2)),
            "q_lora": {"a": jnp.zeros((2, 1)), "b": jnp.zeros((1, 2))},
        },
        "norm": {"weight": jnp.zeros((2,))},
    }
    labels = lora_lib.lora_label_fn(params)
    assert labels["attn"]["q"] == "frozen"
    assert labels["attn"]["q_lora"]["a"] == "lora"
    assert labels["norm"]["weight"] == "frozen"
    only = lora_lib.extract_lora(params)
    assert list(only) == ["attn"] and list(only["attn"]) == ["q_lora"]

    # the optax mask actually freezes base params
    tx = optax.multi_transform(
        {"lora": optax.sgd(1.0), "frozen": optax.set_to_zero()}, labels
    )
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, tx.init(params), params)
    assert float(jnp.sum(jnp.abs(updates["attn"]["q"]))) == 0.0
    assert float(jnp.sum(jnp.abs(updates["attn"]["q_lora"]["a"]))) > 0.0


def test_quantize_base_weights_roundtrip():
    rng = np.random.default_rng(3)
    tree = {"attn": {"q": jnp.asarray(rng.normal(size=(2, 16, 8)).astype(np.float32))}}
    qt = lora_lib.quantize_base_weights(tree)
    assert qt["attn"]["q"]["q"].dtype == jnp.int8
    deq = np.asarray(qt["attn"]["q"]["q"], np.float32) * np.asarray(
        qt["attn"]["q"]["scale"]
    )[:, None, :]
    np.testing.assert_allclose(deq, np.asarray(tree["attn"]["q"]), atol=2e-2)
    # projection path accepts the quantized dict
    x = jnp.asarray(rng.normal(size=(1, 4, 16)).astype(np.float32))
    out = lora_lib.proj({"q": {"q": qt["attn"]["q"]["q"][0], "scale": qt["attn"]["q"]["scale"][0]}}, "q", x)
    want = np.asarray(x) @ np.asarray(tree["attn"]["q"])[0]
    np.testing.assert_allclose(np.asarray(out), want, atol=5e-2, rtol=5e-2)


def _lora_cfg():
    cfg = tiny_pizero_config()
    mixtures = tuple(
        dataclass_replace(m, use_lora=(i == 0), lora=LoraConfig(r=2))
        for i, m in enumerate(cfg.joint.mixtures)
    )
    return dataclass_replace(cfg, joint=dataclass_replace(cfg.joint, mixtures=mixtures))


@pytest.mark.slow
class TestModelWithLora:
    def test_init_preserves_function(self):
        """B=0 at init: LoRA-enabled model == plain model given same base."""
        cfg_plain = tiny_pizero_config()
        cfg_lora = _lora_cfg()
        params_l = pizero.init_params(jax.random.key(0), cfg_lora)
        # strip adapters -> same base tree as plain init with same key
        def strip(d):
            return {
                k: strip(v) if isinstance(v, dict) else v
                for k, v in d.items()
                if not k.endswith("_lora")
            }

        rng = jax.random.key(1)
        ids = jnp.zeros((1, cfg_plain.max_image_text_tokens), jnp.int32)
        ids = ids.at[:, : cfg_plain.siglip.num_image_tokens].set(cfg_plain.image_token_index)
        ids = ids.at[:, cfg_plain.siglip.num_image_tokens].set(2)
        am = (ids != 0).astype(jnp.int32)
        img = jnp.zeros((1, 28, 28, 3))
        prop = jnp.ones((1, 1, cfg_plain.proprio_dim)) * 0.1

        out_lora = pizero.infer_action(params_l, cfg_lora, rng, ids, img, am, prop)
        out_plain = pizero.infer_action(strip(params_l), cfg_plain, rng, ids, img, am, prop)
        np.testing.assert_allclose(
            np.asarray(out_lora), np.asarray(out_plain), rtol=1e-5, atol=1e-6
        )

    def test_trained_adapter_changes_output_and_merges(self):
        cfg = _lora_cfg()
        params = pizero.init_params(jax.random.key(0), cfg)
        # fake "trained" adapters: perturb every b
        def bump(d):
            for k, v in d.items():
                if k.endswith("_lora"):
                    v["b"] = jax.random.normal(jax.random.key(7), v["b"].shape) * 0.05
                elif isinstance(v, dict):
                    bump(v)
        bump(params)

        rng = jax.random.key(1)
        ids = jnp.zeros((1, cfg.max_image_text_tokens), jnp.int32)
        ids = ids.at[:, : cfg.siglip.num_image_tokens].set(cfg.image_token_index)
        am = (ids != 0).astype(jnp.int32)
        img = jnp.zeros((1, 28, 28, 3))
        prop = jnp.ones((1, 1, cfg.proprio_dim)) * 0.1

        out = pizero.infer_action(params, cfg, rng, ids, img, am, prop)
        merged_params = lora_lib.merge_lora(params)
        cfg_plain = tiny_pizero_config()
        out_merged = pizero.infer_action(
            merged_params, cfg_plain, rng, ids, img, am, prop
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(out_merged), rtol=1e-4, atol=1e-5
        )


def test_quantized_model_inference_close_to_float():
    """int8 base weights flow through the full inference path (the QLoRA
    serving configuration: quantized frozen base, reference lora.py:214-360)."""
    cfg = tiny_pizero_config()
    params = pizero.init_params(jax.random.key(0), cfg)
    qparams = dict(params)
    qparams["joint"] = lora_lib.quantize_base_weights(params["joint"])

    rng = jax.random.key(1)
    ids = jnp.zeros((1, cfg.max_image_text_tokens), jnp.int32)
    ids = ids.at[:, : cfg.siglip.num_image_tokens].set(cfg.image_token_index)
    am = (ids != 0).astype(jnp.int32)
    img = jnp.zeros((1, 28, 28, 3))
    prop = jnp.ones((1, 1, cfg.proprio_dim)) * 0.1

    out_f = pizero.infer_action(params, cfg, rng, ids, img, am, prop)
    out_q = pizero.infer_action(qparams, cfg, rng, ids, img, am, prop)
    assert np.isfinite(np.asarray(out_q)).all()
    # int8 per-channel quantization of random-init weights: loose but bounded
    assert float(jnp.mean(jnp.abs(out_f - out_q))) < 0.15


# --------------------------------------------------------------------------- #
# 4-bit (NF4) tier — bnb Linear4bit parity (reference lora.py:214-360)
# --------------------------------------------------------------------------- #

from open_pi_zero_tpu.ops import quantization as q_lib


def test_nf4_code_points_roundtrip_exactly():
    """Values lying exactly on code*absmax must survive quantization."""
    code = np.asarray(q_lib.NF4_CODE, np.float32)
    w = jnp.asarray(np.tile(code, 8).reshape(2, 64) * 3.7)
    d = q_lib.quantize_kernel_nf4(w, block=64)
    assert d["q4"].dtype == jnp.uint8 and d["q4"].shape == (2, 32)
    back = q_lib.dequantize_kernel_nf4(d)
    np.testing.assert_allclose(np.asarray(back), np.asarray(w), rtol=1e-6)


def test_nf4_kernel_roundtrip_accuracy_and_memory():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(3, 128, 256)).astype(np.float32))
    d = q_lib.quantize_kernel_nf4(w)
    # stacked layout: leading dims preserved for lax.scan slicing
    assert d["q4"].shape == (3, 128, 128)
    assert d["absmax"].shape == (3, 128, 256 // 64)
    back = np.asarray(q_lib.dequantize_kernel_nf4(d))
    # NF4 on N(0,1): RMS error ~0.07-0.1 sigma
    rms = np.sqrt(np.mean((back - np.asarray(w)) ** 2))
    assert rms < 0.12, rms
    # ~4.5 bits/param all-in
    nbytes = d["q4"].size + d["absmax"].size * 4
    assert nbytes < w.size * 0.6


def test_q4tensor_generic_roundtrip_with_double_quant():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(100, 70)).astype(np.float32))  # pad path
    for qt_kind in ("nf4", "fp4"):
        qt = q_lib.quantize_4bit(x, quant_type=qt_kind)
        back = np.asarray(q_lib.dequantize_4bit(qt))
        assert back.shape == x.shape
        err = np.abs(back - np.asarray(x))
        assert np.mean(err) < 0.25, (qt_kind, np.mean(err))
    # double quantization (bnb compress_statistics) costs little extra error
    qt_dq = q_lib.quantize_4bit(x, compress_statistics=True)
    assert qt_dq.scale is None and qt_dq.scale_q is not None
    back_dq = np.asarray(q_lib.dequantize_4bit(qt_dq))
    assert np.mean(np.abs(back_dq - np.asarray(x))) < 0.25


def test_base_matmul_and_proj_accept_nf4():
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(16, 64)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(5, 16)).astype(np.float32))
    d = q_lib.quantize_kernel_nf4(w)
    got = np.asarray(lora_lib.base_matmul(x, d))
    want = np.asarray(x) @ np.asarray(q_lib.dequantize_kernel_nf4(d))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_merge_lora_nf4_parity():
    """LoRA-4bit: merged kernel == unmerged (dequant base + delta) forward,
    the reference's Linear4bit merge invariant."""
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    w = jax.random.normal(k1, (3, 16, 64))  # stacked [L, in, out]
    lp = {
        "w": q_lib.quantize_kernel_nf4(w),
        "w_lora": {
            "a": jax.random.normal(k2, (3, 16, 4)) * 0.1,
            "b": jax.random.normal(k3, (3, 4, 64)) * 0.1,
        },
    }
    x = jax.random.normal(jax.random.key(4), (3, 5, 16))
    merged = lora_lib.merge_lora(lp, scaling=1.7)
    assert "w_lora" not in merged
    for layer in range(3):
        unmerged = lora_lib.proj(
            {"w": jax.tree.map(lambda v: v[layer], lp["w"]),
             "w_lora": jax.tree.map(lambda v: v[layer], lp["w_lora"])},
            "w", x[layer], scaling=1.7,
        )
        np.testing.assert_allclose(
            np.asarray(x[layer] @ merged["w"][layer]), np.asarray(unmerged),
            rtol=1e-4, atol=1e-4,
        )


def test_quantize_base_weights_bits4_and_idempotent():
    rng = np.random.default_rng(3)
    tree = {"attn": {"q": jnp.asarray(rng.normal(size=(2, 16, 128)).astype(np.float32))}}
    qt = lora_lib.quantize_base_weights(tree, bits=4)
    assert qt["attn"]["q"]["q4"].dtype == jnp.uint8
    again = lora_lib.quantize_base_weights(qt, bits=4)
    assert again["attn"]["q"]["q4"] is qt["attn"]["q"]["q4"]
    deq = np.asarray(q_lib.dequantize_kernel_nf4(qt["attn"]["q"]))
    # worst-case NF4 error = absmax * half the largest code gap (~0.14);
    # a 64-sample N(0,1) block's absmax can reach ~3.5
    err = deq - np.asarray(tree["attn"]["q"])
    assert np.abs(err).max() < 0.6 and np.sqrt(np.mean(err**2)) < 0.12


@pytest.mark.slow
def test_nf4_model_inference_close_to_float():
    """NF4 base weights flow through the full inference path (the 4-bit
    serving tier, reference lora.py:83-100)."""
    cfg = tiny_pizero_config()
    params = pizero.init_params(jax.random.key(0), cfg)
    qparams = dict(params)
    qparams["joint"] = lora_lib.quantize_base_weights(params["joint"], bits=4)

    rng = jax.random.key(1)
    ids = jnp.zeros((1, cfg.max_image_text_tokens), jnp.int32)
    ids = ids.at[:, : cfg.siglip.num_image_tokens].set(cfg.image_token_index)
    am = (ids != 0).astype(jnp.int32)
    img = jnp.zeros((1, 28, 28, 3))
    prop = jnp.ones((1, 1, cfg.proprio_dim)) * 0.1

    out_f = pizero.infer_action(params, cfg, rng, ids, img, am, prop)
    out_q = pizero.infer_action(qparams, cfg, rng, ids, img, am, prop)
    assert np.isfinite(np.asarray(out_q)).all()
    assert float(jnp.mean(jnp.abs(out_f - out_q))) < 0.25


# --------------------------------------------------------------------------- #
# SigLIP / projector LoRA (reference vision.use_lora, siglip.py:98-106,9-31;
# freeze_non_lora_weights_in_vlm, reference pizero.py:236-248)
# --------------------------------------------------------------------------- #


def _siglip_lora_cfg():
    cfg = tiny_pizero_config()
    return dataclass_replace(
        cfg, siglip=dataclass_replace(cfg.siglip, use_lora=True, lora=LoraConfig(r=2))
    )


def test_siglip_lora_init_identity_and_merge():
    from open_pi_zero_tpu.models import siglip as siglip_lib

    cfg = _siglip_lora_cfg()
    key = jax.random.key(0)
    params = siglip_lib.init_params(key, cfg.siglip)
    assert "q_lora" in params["layers"]["attn"]
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 28, 28, 3)), jnp.float32)

    # zero-init B => adapters are inert at init
    plain = {
        "embeddings": params["embeddings"],
        "layers": {
            g: {k: v for k, v in d.items() if not k.endswith("_lora")}
            for g, d in params["layers"].items()
        },
        "post_layernorm": params["post_layernorm"],
    }
    out_lora = siglip_lib.forward(params, cfg.siglip, x)
    out_plain = siglip_lib.forward(plain, cfg.siglip, x)
    np.testing.assert_allclose(
        np.asarray(out_lora), np.asarray(out_plain), rtol=1e-5, atol=1e-6
    )

    # "trained" adapters change the output; merging reproduces it exactly
    bumped = jax.tree.map(lambda v: v, params)
    for g in ("attn", "mlp"):
        for k in list(bumped["layers"][g]):
            if k.endswith("_lora"):
                lb = bumped["layers"][g][k]
                bumped["layers"][g][k] = {
                    "a": lb["a"],
                    "b": jax.random.normal(jax.random.key(5), lb["b"].shape) * 0.05,
                }
    out_trained = siglip_lib.forward(bumped, cfg.siglip, x)
    assert float(jnp.mean(jnp.abs(out_trained - out_plain))) > 1e-5
    merged = lora_lib.merge_lora(bumped)
    assert not lora_lib.has_lora(merged)
    # merged kernels keep the {kernel, bias} layout
    assert "kernel" in merged["layers"]["attn"]["q"]
    out_merged = siglip_lib.forward(merged, cfg.siglip, x)
    np.testing.assert_allclose(
        np.asarray(out_merged), np.asarray(out_trained), rtol=1e-4, atol=1e-5
    )


def test_projector_lora_and_full_model():
    from open_pi_zero_tpu.models import siglip as siglip_lib

    cfg = _siglip_lora_cfg()
    proj = siglip_lib.init_projector_params(jax.random.key(1), cfg.siglip)
    assert "kernel_lora" in proj
    feats = jnp.asarray(np.random.default_rng(1).normal(size=(1, 4, cfg.siglip.hidden_size)), jnp.float32)
    out0 = siglip_lib.project(proj, feats)
    plain = {k: v for k, v in proj.items() if k != "kernel_lora"}
    np.testing.assert_allclose(
        np.asarray(out0), np.asarray(siglip_lib.project(plain, feats)), rtol=1e-5
    )

    # whole model runs with vision adapters present
    params = pizero.init_params(jax.random.key(0), cfg)
    assert lora_lib.has_lora(params["siglip"]) and lora_lib.has_lora(params["projector"])
    ids = jnp.zeros((1, cfg.max_image_text_tokens), jnp.int32)
    ids = ids.at[:, : cfg.siglip.num_image_tokens].set(cfg.image_token_index)
    am = (ids != 0).astype(jnp.int32)
    img = jnp.zeros((1, 28, 28, 3))
    prop = jnp.ones((1, 1, cfg.proprio_dim)) * 0.1
    out = pizero.infer_action(params, cfg, jax.random.key(1), ids, img, am, prop)
    assert np.isfinite(np.asarray(out)).all()


def test_lora_only_vlm_labels_freeze_bases():
    """TrainingConfig.lora=True: VLM-side bases frozen, adapters + action
    expert trained (reference freeze_non_lora_weights_in_vlm)."""
    from open_pi_zero_tpu.config import TrainingConfig
    from open_pi_zero_tpu.training import optimizer as opt_lib

    cfg = _siglip_lora_cfg()
    mixtures = tuple(
        dataclass_replace(m, use_lora=(name == "vlm"), lora=LoraConfig(r=2))
        for name, m in zip(cfg.joint.mixture_names, cfg.joint.mixtures)
    )
    cfg = dataclass_replace(cfg, joint=dataclass_replace(cfg.joint, mixtures=mixtures))
    params = pizero.init_params(jax.random.key(0), cfg)
    labels = opt_lib.param_labels(params, train_vlm=True, lora=True)
    assert labels["siglip"]["layers"]["attn"]["q"]["kernel"] == "frozen"
    assert labels["siglip"]["layers"]["attn"]["q_lora"]["a"] == "vlm"
    assert labels["projector"]["kernel"] == "frozen"
    assert labels["projector"]["kernel_lora"]["a"] == "vlm"
    vlm = labels["joint"]["mixtures"]["vlm"]["layers"]
    assert vlm["attn"]["q"] == "frozen" and vlm["attn"]["q_lora"]["a"] == "vlm"
    act = labels["joint"]["mixtures"]["action"]["layers"]
    assert act["attn"]["q"] == "action"

    # end-to-end: the optimizer zeroes frozen updates
    import optax

    tcfg = TrainingConfig(lora=True)
    tx = opt_lib.build_optimizer(tcfg, params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, tx.init(params), params)
    assert float(jnp.sum(jnp.abs(updates["siglip"]["layers"]["attn"]["q"]["kernel"]))) == 0.0
    assert float(jnp.sum(jnp.abs(updates["siglip"]["layers"]["attn"]["q_lora"]["b"]))) > 0.0
    assert float(jnp.sum(jnp.abs(updates["joint"]["mixtures"]["vlm"]["layers"]["attn"]["q"]))) == 0.0
    assert float(jnp.sum(jnp.abs(updates["joint"]["mixtures"]["action"]["layers"]["attn"]["q"]))) > 0.0


def test_quantized_bases_frozen_without_lora():
    """quantize=true + lora=false (a supported combo: configs wire
    use_quantize=${quantize} independently of lora) must still freeze the
    quantized base dicts: the reference keeps bnb-quantized modules fully
    frozen (train.py:90-93 "fully frozen"). Regression test for the
    round-2 advisor finding where the fp32 absmax leaves got real AdamW
    updates through the differentiable NF4 dequant."""
    from open_pi_zero_tpu.config import TrainingConfig
    from open_pi_zero_tpu.training import optimizer as opt_lib

    cfg = tiny_pizero_config()
    mixtures = tuple(
        dataclass_replace(m, use_quantize=(name == "vlm"))
        for name, m in zip(cfg.joint.mixture_names, cfg.joint.mixtures)
    )
    cfg = dataclass_replace(cfg, joint=dataclass_replace(cfg.joint, mixtures=mixtures))
    params = pizero.init_params(jax.random.key(0), cfg)
    params = lora_lib.quantize_per_model_config(params, cfg)
    q = params["joint"]["mixtures"]["vlm"]["layers"]["attn"]["q"]
    assert isinstance(q, dict) and "q4" in q  # NF4 base in place

    labels = opt_lib.param_labels(params, train_vlm=True, lora=False)
    vlm = labels["joint"]["mixtures"]["vlm"]["layers"]
    assert set(vlm["attn"]["q"].values()) == {"frozen"}
    assert set(vlm["mlp"]["gate"].values()) == {"frozen"}
    # non-quantized vlm leaves keep training
    assert vlm["input_norm"]["weight"] == "vlm"

    # end-to-end: the optimizer zeroes every quantized-base update
    tcfg = TrainingConfig(lora=False)
    tx = opt_lib.build_optimizer(tcfg, params)
    # grads as produced by jax.grad(..., allow_int=True): float leaves get
    # real grads, int payloads get zeros
    grads = jax.tree.map(
        lambda x: (
            jnp.ones_like(x)
            if jnp.issubdtype(x.dtype, jnp.floating)
            else jnp.zeros(x.shape, jnp.float32)
        ),
        params,
    )
    updates, _ = tx.update(grads, tx.init(params), params)
    uq = updates["joint"]["mixtures"]["vlm"]["layers"]["attn"]["q"]
    assert float(jnp.sum(jnp.abs(uq["absmax"]))) == 0.0
    un = updates["joint"]["mixtures"]["vlm"]["layers"]["input_norm"]["weight"]
    assert float(jnp.sum(jnp.abs(un))) > 0.0


def test_convert_siglip_maps_lora_adapters():
    """convert_siglip picks up reference lora_A/lora_B tensors beside each
    frozen .weight (reference LoRALinear, src/model/lora.py:167-168) and a
    SigLIP forward through the converted tree matches merge-then-forward."""
    from open_pi_zero_tpu.models import convert, siglip as siglip_lib

    cfg = _siglip_lora_cfg()
    sc = cfg.siglip
    L, D, I, P, r = (sc.num_hidden_layers, sc.hidden_size,
                     sc.intermediate_size, sc.patch_size, 2)
    rng = np.random.default_rng(0)
    t = {}
    p = "vision_tower.vision_model."
    t[p + "embeddings.patch_embedding.weight"] = rng.normal(size=(D, 3, P, P)).astype(np.float32)
    t[p + "embeddings.patch_embedding.bias"] = rng.normal(size=(D,)).astype(np.float32)
    t[p + "embeddings.position_embedding.weight"] = rng.normal(size=(sc.num_patches, D)).astype(np.float32)
    t[p + "post_layernorm.weight"] = rng.normal(size=(D,)).astype(np.float32)
    t[p + "post_layernorm.bias"] = rng.normal(size=(D,)).astype(np.float32)
    names = {
        "self_attn.q_proj": (D, D), "self_attn.k_proj": (D, D),
        "self_attn.v_proj": (D, D), "self_attn.out_proj": (D, D),
        "mlp.fc1": (I, D), "mlp.fc2": (D, I),
    }
    for layer in range(L):
        q = f"{p}encoder.layers.{layer}."
        for ln in ("layer_norm1", "layer_norm2"):
            t[q + ln + ".weight"] = rng.normal(size=(D,)).astype(np.float32)
            t[q + ln + ".bias"] = rng.normal(size=(D,)).astype(np.float32)
        for n, (dout, din) in names.items():
            t[q + n + ".weight"] = rng.normal(size=(dout, din)).astype(np.float32)
            t[q + n + ".bias"] = rng.normal(size=(dout,)).astype(np.float32)
            t[q + n + ".lora_A"] = (rng.normal(size=(r, din)) * 0.1).astype(np.float32)
            t[q + n + ".lora_B"] = (rng.normal(size=(dout, r)) * 0.1).astype(np.float32)

    tree = convert.convert_siglip(t, cfg)
    attn = tree["layers"]["attn"]
    assert "q_lora" in attn and attn["q_lora"]["a"].shape == (L, D, r)
    assert attn["q_lora"]["b"].shape == (L, r, D)
    np.testing.assert_allclose(
        attn["q_lora"]["a"][0],
        t[p + "encoder.layers.0.self_attn.q_proj.lora_A"].T,
    )

    x = jnp.asarray(rng.normal(size=(1, 28, 28, 3)), jnp.float32)
    tree = jax.tree.map(jnp.asarray, tree)
    out_adapters = siglip_lib.forward(tree, sc, x)
    out_merged = siglip_lib.forward(lora_lib.merge_lora(tree), sc, x)
    np.testing.assert_allclose(
        np.asarray(out_adapters), np.asarray(out_merged), rtol=1e-4, atol=1e-4
    )
