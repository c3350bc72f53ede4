#!/usr/bin/env python
"""Checkpoint-arrival readiness harness: ONE command that, given weights
(+ optionally an env), chains every acceptance check in order — the
hour-one procedure when real weights land.

Stages (each prints PASS/FAIL/SKIP; nonzero exit on any FAIL):

  load      checkpoint -> canonical float params (torch .pt trainer
            checkpoint, safetensors PaliGemma dir, or orbax params dir)
  textgen   greedy caption tokens vs a recorded expectation — the
            reference's parity check #1 (README.md:38-40, "this image
            shows" captioning with pretrained PaliGemma)
  oracle    KV-cached infer_action vs the no-cache forward (the central
            numerical oracle; reference cache-vs-naive drift band
            README.md:116: 5e-4–2.5e-3 mean L1 in bf16)
  drift     production serving layout (fused + int8 expert + W8A8
            prefill) vs bf16 fused — chunk L1 must stay inside the band
  refine    refined steady-state tier (infer_action_refined) vs the full
            flow on the same observation — report-only unless
            --refine-band is given
  episodes  if simpler_env imports: N-episode closed-loop smoke with
            success accounting (reference eval.py:60-179); else SKIP

--self-test runs the whole chain TODAY against the in-process torch
reference at tiny geometry (tests/test_reference_parity_pizero.py's
builders): the torch state_dict is saved to a .pt and pushed through the
same load path real checkpoints use, textgen is compared against the
torch model's own logits, and a parity stage checks infer_action against
the torch forward with injected noise.

Usage:
  python scripts/verify_checkpoint.py --self-test
  python scripts/verify_checkpoint.py ckpt.pt --config configs/eval/bridge.yaml \
      [--expected-tokens toks.json --tokenizer DIR --image img.jpg] [--episodes 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_RESULTS = []


def _report(stage: str, status: str, detail: str = ""):
    _RESULTS.append((stage, status))
    print(f"[{stage:9s}] {status:4s}  {detail}")


def _check(stage: str, ok: bool, detail: str):
    _report(stage, "PASS" if ok else "FAIL", detail)
    return ok


# --------------------------------------------------------------------------- #
# stages
# --------------------------------------------------------------------------- #


def stage_load(path: str, cfg, dtype):
    """Any supported weight format -> canonical float params pytree."""
    import jax

    from open_pi_zero_tpu.models import convert, pizero
    from open_pi_zero_tpu.ops import lora as lora_lib

    if path.endswith(".pt"):
        params = convert.load_vla_checkpoint(path, cfg, dtype)
        kind = "torch .pt trainer checkpoint"
    elif os.path.isdir(path) and any(
        f.endswith(".safetensors") for f in os.listdir(path)
    ):
        tensors = convert.load_safetensors_dir(path)
        params = convert.to_dtype(convert.convert_paligemma(tensors, cfg), dtype)
        kind = "safetensors (PaliGemma)"
    else:
        from open_pi_zero_tpu.training import checkpoint as ckpt_lib

        abstract = pizero.init_params(jax.random.key(0), cfg, dtype=dtype)
        abstract = lora_lib.quantize_per_model_config(abstract, cfg)
        params = convert.to_dtype(ckpt_lib.restore_params(path, abstract), dtype)
        kind = "orbax params dir"
    if lora_lib.has_lora(params):
        params = {
            **params,
            "joint": {
                "mixtures": {
                    n: lora_lib.merge_lora(m, cfg.joint.mixture(n).lora_scaling)
                    for n, m in params["joint"]["mixtures"].items()
                }
            },
        }
        for k in ("siglip", "projector"):
            if lora_lib.has_lora(params.get(k, {})):
                params[k] = lora_lib.merge_lora(params[k], cfg.siglip.lora_scaling)
        kind += " + merged LoRA"
    if lora_lib.has_quantized_bases(params):
        params = lora_lib.dequantize_base_weights(params, dtype)
        kind += " + dequantized bases"
    n = sum(x.size for x in jax.tree.leaves(params))
    size = f"{n / 1e9:.2f}B" if n >= 1e8 else f"{n / 1e6:.2f}M"
    _report("load", "PASS", f"{kind}, {size} params")
    return params


def _example_vla_inputs(cfg, b=1, seed=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    n_img = cfg.siglip.num_image_tokens
    ids = np.zeros((b, cfg.max_image_text_tokens), np.int32)
    ids[:, :n_img] = cfg.image_token_index
    ids[:, n_img] = 2
    ids[:, n_img + 1 : min(n_img + 4, cfg.max_image_text_tokens)] = 10
    am = (ids != cfg.pad_token_id).astype(np.int32)
    img = rng.normal(size=(b, cfg.siglip.image_size, cfg.siglip.image_size, 3))
    prop = rng.normal(size=(b, cfg.cond_steps, cfg.proprio_dim))
    return ids, img.astype(np.float32), am, prop.astype(np.float32)


def stage_textgen(params, cfg, expected, image=None, prompt=None, tokenizer=None,
                  max_new=8):
    """Greedy tokens on a fixed input vs a recorded expectation. With a real
    image/tokenizer the caption is decoded and printed (the reference's
    "this image shows ..." check); without an expectation the tokens are
    printed for recording."""
    import jax.numpy as jnp
    import numpy as np

    from open_pi_zero_tpu.models import pizero

    if not cfg.use_lm_head:
        _report("textgen", "SKIP", "checkpoint has no lm head (VLA fine-tune)")
        return True
    if image is not None and tokenizer is not None:
        from PIL import Image

        from open_pi_zero_tpu.processing import (
            PaliGemmaProcessor,
            load_paligemma_tokenizer,
        )

        tok = load_paligemma_tokenizer(tokenizer)
        proc = PaliGemmaProcessor(
            tok, num_image_tokens=cfg.siglip.num_image_tokens,
            image_size=cfg.siglip.image_size,
        )
        inputs = proc([prompt or "this image shows "],
                      [Image.open(image).convert("RGB")])
        ids = jnp.asarray(inputs["input_ids"])
        pix = jnp.asarray(inputs["pixel_values"])
    else:
        tok = None
        n_img = cfg.siglip.num_image_tokens
        raw, img, _, _ = _example_vla_inputs(cfg)
        ids = jnp.asarray(raw[:, : n_img + 3])
        pix = jnp.asarray(img)
    toks = np.asarray(
        pizero.generate_text(params, cfg, ids, pix, max_new_tokens=max_new)
    )[0].tolist()
    if tok is not None:
        text = tok.decode([t for t in toks if t not in (0, 1)])
        detail = f"tokens={toks} caption={text!r}"
    else:
        detail = f"tokens={toks}"
    if expected is None:
        _report("textgen", "PASS", detail + "  (no expectation recorded — "
                "save these tokens as the golden)")
        return True
    return _check("textgen", list(toks[: len(expected)]) == list(expected),
                  f"{detail} vs expected {expected}")


def stage_oracle(params, cfg, band, seed=1):
    """Cached infer_action vs the no-cache forward with identical noise."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_pi_zero_tpu.models import pizero

    ids, img, am, prop = _example_vla_inputs(cfg, seed=seed)
    rng = jax.random.key(seed)
    args = (jnp.asarray(ids), jnp.asarray(img), jnp.asarray(am), jnp.asarray(prop))
    cached = np.asarray(pizero.infer_action(params, cfg, rng, *args))
    naive = np.asarray(pizero.infer_action_naive(params, cfg, rng, *args))
    drift = float(np.mean(np.abs(cached - naive)))
    return _check("oracle", drift <= band,
                  f"cached-vs-naive mean L1 {drift:.2e} (band {band:.1e})")


def stage_drift(params, cfg, band, seed=2):
    """Production serving layout vs bf16 fused on the same chunk."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_pi_zero_tpu.models import fuse, pizero

    ids, img, am, prop = _example_vla_inputs(cfg, seed=seed)
    rng = jax.random.key(seed)
    args = (jnp.asarray(ids), jnp.asarray(img), jnp.asarray(am), jnp.asarray(prop))
    x0 = jax.random.normal(
        jax.random.key(7), (1, cfg.horizon_steps, cfg.action_dim), jnp.float32
    )
    bf16 = fuse.prepare_for_serving(params)
    want = np.asarray(
        pizero.infer_action(bf16, cfg, rng, *args, action0=x0)
    )
    served = fuse.prepare_for_serving(
        params, quantize_mixtures=("action",), w8a8_mixtures=("vlm",),
        w8a8_siglip=True,
    )
    got = np.asarray(pizero.infer_action(served, cfg, rng, *args, action0=x0))
    drift = float(np.mean(np.abs(got - want)))
    return _check("drift", drift <= band,
                  f"serving-vs-bf16 chunk L1 {drift:.2e} (band {band:.1e})")


def stage_refine(params, cfg, band, t_start=0.5, seed=3):
    """Refined tier (pizero.infer_action_refined): warm-start from the full
    chunk re-noised to t_start, integrate [t_start, 1] — measures how far
    the cheap steady-state path lands from the full flow on the SAME
    observation. Report-only unless --refine-band is given: the acceptable
    gap is a policy-level question (does Simpler success hold at the
    refined tier?) that needs real weights + env."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_pi_zero_tpu.models import pizero

    ids, img, am, prop = _example_vla_inputs(cfg, seed=seed)
    rng = jax.random.key(seed)
    args = (jnp.asarray(ids), jnp.asarray(img), jnp.asarray(am), jnp.asarray(prop))
    full = pizero.infer_action(params, cfg, rng, *args)
    refined = pizero.infer_action_refined(
        params, cfg, jax.random.key(seed + 1), *args, full, t_start=t_start
    )
    gap = float(np.mean(np.abs(np.asarray(refined) - np.asarray(full))))
    finite = bool(np.isfinite(np.asarray(refined)).all())
    if band is None:
        _report("refine", "PASS" if finite else "FAIL",
                f"refined(t={t_start})-vs-full chunk L1 {gap:.2e} "
                "(report-only; set --refine-band to enforce)")
        return finite
    return _check("refine", finite and gap <= band,
                  f"refined(t={t_start})-vs-full chunk L1 {gap:.2e} (band {band:.1e})")


def stage_episodes(params, cfg_dict, model_cfg, episodes):
    """Closed-loop Simpler smoke (reference eval.py:60-179)."""
    try:
        import simpler_env  # noqa: F401
    except ImportError:
        _report("episodes", "SKIP",
                "simpler_env not installed — when an env is available, rerun "
                f"with --episodes {episodes or 10}")
        return True
    from open_pi_zero_tpu.agents.eval import EvalAgent

    cfg_dict["n_eval_episode"] = int(episodes or 10)
    agent = EvalAgent(cfg_dict, params=params)
    stats = agent.run()
    return _check(
        "episodes", stats["n_episode"] >= int(episodes or 10),
        f"success rate {stats.get('success_rate', float('nan')):.3f} over "
        f"{stats['n_episode']} episodes",
    )


# --------------------------------------------------------------------------- #
# self-test: the full chain against the in-process torch reference
# --------------------------------------------------------------------------- #


def _selftest_inputs(cfg):
    """Deterministic text + action inputs shared by the live-torch and
    fixture-replay self-test paths (rng draw order is part of the golden)."""
    import numpy as np

    n_img = cfg.siglip.num_image_tokens
    rng = np.random.default_rng(9)
    s = n_img + 3
    ids = np.full((1, s), 7, np.int64)
    ids[:, :n_img] = cfg.image_token_index
    ids[:, n_img] = 2
    pix = rng.normal(size=(1, 3, cfg.siglip.image_size, cfg.siglip.image_size))
    pix = pix.astype(np.float32)

    b = 2
    idsv = np.zeros((b, cfg.max_image_text_tokens), np.int64)
    idsv[:, :n_img] = cfg.image_token_index
    idsv[:, n_img] = 2
    idsv[0, n_img + 1 : n_img + 3] = [10, 11]
    idsv[1, n_img + 1] = 12
    am = (idsv != 0).astype(np.int64)
    pixv = rng.normal(
        size=(b, 3, cfg.siglip.image_size, cfg.siglip.image_size)
    ).astype(np.float32)
    prop = rng.normal(size=(b, cfg.cond_steps, cfg.proprio_dim)).astype(np.float32)
    a0 = rng.normal(size=(b, cfg.horizon_steps, cfg.action_dim)).astype(np.float32)
    return ids, pix, idsv, am, pixv, prop, a0


def _selftest_reference_payload(parity, golden, cfg):
    """Live torch path: build the reference model, compute the golden
    logits + action chunk, and RECORD them (tests/fixtures/verify_selftest)
    so the self-test keeps running after the reference mount is gone."""
    import numpy as np
    import torch

    ref, _, _ = parity.build_models(seed=3, lm_head=True)
    ids, pix, idsv, am, pixv, prop, a0 = _selftest_inputs(cfg)

    import src.model.vla.pizero as ref_mod

    ref_mod.bsz = 1
    with torch.no_grad():
        want_logits = ref.infer_text(
            input_ids=torch.from_numpy(ids),
            pixel_values=torch.from_numpy(pix),
            attention_mask=torch.from_numpy(np.ones(ids.shape, np.int64)),
            kv_cache=ref.build_text_cache(),
        )["logits"].numpy()

    orig_randn = torch.randn
    torch.randn = lambda *shape, **kw: torch.from_numpy(a0.copy())
    try:
        mask, vp, pp, ap = ref.build_causal_mask_and_position_ids(
            torch.from_numpy(am), dtype=torch.float32
        )
        prefix_mask, action_mask = ref.split_full_mask_into_submasks(mask)
        with torch.no_grad():
            want_action = ref.infer_action(
                input_ids=torch.from_numpy(idsv),
                pixel_values=torch.from_numpy(pixv),
                image_text_proprio_mask=prefix_mask,
                action_mask=action_mask,
                vlm_position_ids=vp,
                proprio_position_ids=pp,
                action_position_ids=ap,
                proprios=torch.from_numpy(prop),
            ).numpy()
    finally:
        torch.randn = orig_randn
    return golden.save_fixture("verify_selftest", {
        "state": golden.state_to_numpy(ref.state_dict()),
        "want_logits": want_logits, "want_action": want_action,
    })


def self_test() -> bool:
    import jax
    import jax.numpy as jnp
    import numpy as np

    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from tests import golden
    from tests import test_reference_parity_pizero as parity

    cfg = parity.build_our_cfg(lm_head=True)
    if golden.reference_mounted():
        payload = _selftest_reference_payload(parity, golden, cfg)
        source = "live torch reference (fixture refreshed)"
    elif golden.have_fixture("verify_selftest"):
        payload = golden.load_fixture("verify_selftest")
        source = "recorded fixture (reference not mounted)"
    else:
        _report("self-test", "SKIP", "reference not mounted and no fixture")
        return True
    _report("self-test", "PASS", source)
    ids, pix, idsv, am, pixv, prop, a0 = _selftest_inputs(cfg)

    # 1) the REAL load path: state_dict -> .pt -> load_vla_checkpoint
    # (fixture replay reconstructs the torch state_dict from numpy; if even
    # torch is gone, the converter consumes the numpy state directly)
    try:
        import torch
    except ImportError:
        torch = None
    if torch is not None:
        state = {
            k: (torch.from_numpy(v) if isinstance(v, np.ndarray) else v)
            for k, v in payload["state"].items()
        }
        with tempfile.TemporaryDirectory() as td:
            pt = os.path.join(td, "ckpt.pt")
            torch.save({"model": state, "cnt_update": 0}, pt)
            params = stage_load(pt, cfg, jnp.float32)
    else:
        from open_pi_zero_tpu.models import convert

        params = convert.convert_vla_state_dict(dict(payload["state"]), cfg)
        _report("load", "PASS", "converter direct (torch unavailable)")

    ok = True

    # 2) textgen vs the recorded reference prefill logits (greedy first
    # token) — the strongest in-process stand-in for recorded golden tokens
    expected_first = int(payload["want_logits"][0, -1].argmax())
    from open_pi_zero_tpu.models import pizero as ours

    toks = np.asarray(
        ours.generate_text(
            params, cfg, jnp.asarray(ids, jnp.int32),
            jnp.asarray(pix.transpose(0, 2, 3, 1)), max_new_tokens=3,
        )
    )
    ok &= _check("textgen", int(toks[0, 0]) == expected_first,
                 f"first greedy token {int(toks[0, 0])} vs torch {expected_first}")

    # 3) infer_action parity vs the recorded torch chunk (injected noise)
    got = np.asarray(
        ours.infer_action(
            params, cfg, jax.random.key(0), jnp.asarray(idsv, jnp.int32),
            jnp.asarray(pixv.transpose(0, 2, 3, 1)), jnp.asarray(am, jnp.int32),
            jnp.asarray(prop), action0=jnp.asarray(a0),
        )
    )
    err = float(np.max(np.abs(got - payload["want_action"])))
    ok &= _check("parity", err < 2e-4, f"infer_action max|diff| {err:.2e} vs torch")

    # 4) cached-vs-naive oracle + 5) quantized serving drift (fp32 here, so
    # the oracle is tight; the drift band is the documented serving budget)
    ok &= stage_oracle(params, cfg, band=1e-5)
    ok &= stage_drift(params, cfg, band=2.5e-3)
    ok &= stage_refine(params, cfg, band=None)

    # 6) episode loop (skips without simpler_env)
    stage_episodes(None, None, cfg, 0)
    return ok


# --------------------------------------------------------------------------- #


def main():
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint", nargs="?", help=".pt / safetensors dir / orbax dir")
    p.add_argument("--self-test", action="store_true",
                   help="run the whole chain against the in-process torch "
                        "reference at tiny geometry")
    p.add_argument("--config", default=os.path.join(REPO, "configs/eval/bridge.yaml"))
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--expected-tokens", help="JSON file: list of golden token ids")
    p.add_argument("--tokenizer", help="PaliGemma dir with tokenizer.model")
    p.add_argument("--image", help="image file for the caption check")
    p.add_argument("--prompt", default="this image shows ")
    p.add_argument("--oracle-band", type=float, default=2.5e-3,
                   help="cached-vs-naive mean-L1 budget (reference README.md:116)")
    p.add_argument("--drift-band", type=float, default=2.5e-3,
                   help="quantized-serving chunk-L1 budget")
    p.add_argument("--refine-band", type=float, default=None,
                   help="refined-tier (refine_from_prev) chunk-L1 budget; "
                        "omitted = report-only")
    p.add_argument("--episodes", type=int, default=0,
                   help="closed-loop episodes to run when simpler_env exists")
    args = p.parse_args()

    if os.environ.get("OPZ_VERIFY_CPU"):
        # host-side verification: force the CPU backend (must happen via
        # config AFTER the import — the axon sitecustomize already imported
        # jax, so env vars are too late)
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.self_test:
        ok = self_test()
    else:
        if not args.checkpoint:
            p.error("checkpoint path required (or --self-test)")
        import jax.numpy as jnp

        from open_pi_zero_tpu.config import load_config, pizero_config_from_dict

        cfg_dict = load_config(args.config)
        cfg_dict["checkpoint_path"] = args.checkpoint
        model_cfg = pizero_config_from_dict(cfg_dict)
        dtype = jnp.bfloat16 if args.bf16 else jnp.float32
        params = stage_load(os.path.expanduser(args.checkpoint), model_cfg, dtype)
        expected = None
        if args.expected_tokens:
            with open(args.expected_tokens) as f:
                expected = json.load(f)
        ok = stage_textgen(params, model_cfg, expected, args.image, args.prompt,
                           args.tokenizer)
        ok &= stage_oracle(params, model_cfg, args.oracle_band)
        ok &= stage_drift(params, model_cfg, args.drift_band)
        ok &= stage_refine(params, model_cfg, args.refine_band)
        ok &= stage_episodes(params, cfg_dict, model_cfg, args.episodes)

    n_fail = sum(1 for _, s in _RESULTS if s == "FAIL")
    print(f"\n{'ALL STAGES PASSED' if ok and not n_fail else f'{n_fail} FAILURES'}")
    sys.exit(0 if ok and not n_fail else 1)


if __name__ == "__main__":
    main()
