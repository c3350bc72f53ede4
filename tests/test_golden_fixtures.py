"""Quick-tier replay of the committed reference-parity goldens.

The torch-parity suite (tests/test_reference_parity*.py) records each
scenario's reference-side payload — inputs, the reference PyTorch
state_dict (as numpy), and the reference outputs — into tests/fixtures/
whenever it runs with /root/reference mounted. These tests replay those
payloads through the SAME ``_verify_*`` functions with no torch or
reference dependency, so the numerical-parity evidence (converter key
maps, Gemma norm/RoPE/softcap semantics, block masks, the full KV-cached
infer_action and the PaliGemma text path) keeps executing after the
reference mount is gone (round-3 verdict task 6; SURVEY.md §4
"golden-value parity tests against captured PyTorch activations").

Refresh: run the full suite with the reference mounted and commit the
changed tests/fixtures/*.npz.
"""

from tests import golden
from tests import test_reference_parity as joint_parity
from tests import test_reference_parity_pizero as pizero_parity


def test_golden_joint_training_forward():
    joint_parity._verify_training_forward(
        golden.load_fixture_or_skip("joint_training_forward"),
        joint_parity.GEOM, joint_parity.MIX, joint_parity.LENS,
    )


def test_golden_joint_training_forward_mid_geometry():
    joint_parity._verify_training_forward(
        golden.load_fixture_or_skip("joint_training_forward_mid"),
        joint_parity.GEOM_MID, joint_parity.MIX_MID, joint_parity.LENS_MID,
    )


def test_golden_gemma_modules():
    joint_parity._verify_gemma_modules(golden.load_fixture_or_skip("gemma_modules"))


def test_golden_joint_cached_action_step():
    joint_parity._verify_cached_action_step(
        golden.load_fixture_or_skip("joint_cached_action_step")
    )


def test_golden_siglip_tower():
    joint_parity._verify_siglip_tower(golden.load_fixture_or_skip("siglip_tower"))


def test_golden_lora_forward():
    joint_parity._verify_lora_forward(golden.load_fixture_or_skip("lora_forward"))


def test_golden_adaln_zero_forward():
    joint_parity._verify_adaln_zero_forward(
        golden.load_fixture_or_skip("adaln_zero_forward")
    )


def test_golden_pizero_mask_positions():
    pizero_parity._verify_mask_and_positions(
        golden.load_fixture_or_skip("pizero_mask_positions")
    )


def test_golden_pizero_flow_loss():
    pizero_parity._verify_flow_matching_loss(
        golden.load_fixture_or_skip("pizero_flow_loss")
    )


def test_golden_pizero_infer_action():
    pizero_parity._verify_infer_action(
        golden.load_fixture_or_skip("pizero_infer_action")
    )


def test_golden_pizero_text_logits():
    pizero_parity._verify_text_logits(
        golden.load_fixture_or_skip("pizero_text_logits")
    )
