"""Drawer language-grounding lever machinery (round-4 verdict task 3):
per-target-balanced demo collection and the primary+coverage weighted
mix registrations (docs/DRAWER_INVESTIGATION.md "Honest status")."""

import numpy as np

from open_pi_zero_tpu.envs import (
    collect_fractal_demos,
    register_drawer_lever_mix,
    register_simpler_lite_tri_lever_mix,
)


def test_balance_targets_rotates_instructions():
    episodes, rate = collect_fractal_demos(
        6, seed=0, render_size=56, balance_targets=True
    )
    assert rate == 1.0
    # ep_id % 3 target rotation: exactly 2 demos per language target
    # (failed episodes would break the count — the expert is reliable on
    # default starts)
    instr = [
        e["steps"]["observation"]["natural_language_instruction"][0]
        for e in episodes
    ]
    counts = {}
    for s in instr:
        s = s.decode() if isinstance(s, bytes) else str(s)
        counts[s] = counts.get(s, 0) + 1
    assert counts == {
        "open the top drawer": 2,
        "open the middle drawer": 2,
        "open the bottom drawer": 2,
    }, counts


def test_unbalanced_collection_keeps_episode_keyed_targets():
    eps_bal, _ = collect_fractal_demos(3, seed=0, render_size=56,
                                       balance_targets=True)
    eps_def, _ = collect_fractal_demos(3, seed=0, render_size=56)
    # layouts are episode-keyed in both; only the target assignment
    # differs (balanced = ep % 3, default = episode-keyed random draw)
    a = eps_bal[0]["steps"]["observation"]["base_pose_tool_reached"][0]
    b = eps_def[0]["steps"]["observation"]["base_pose_tool_reached"][0]
    np.testing.assert_allclose(a[:2], b[:2])  # same eef start


def test_lever_mix_registration():
    from open_pi_zero_tpu.data import oxe

    name = register_drawer_lever_mix(cov_weight=0.5)
    assert name == "fractal_drawer_lever"
    assert oxe.MIXES[name] == [
        ("fractal20220817_data", 1.0),
        ("fractal_drawer_cov", 0.5),
    ]
    assert oxe.REGISTRY["fractal_drawer_cov"]["proprio_encoding"] == (
        oxe.REGISTRY["fractal20220817_data"]["proprio_encoding"]
    )
    assert oxe.STANDARDIZE_FNS["fractal_drawer_cov"] is oxe.rt1_transform

    tri = register_simpler_lite_tri_lever_mix()
    assert [d for d, _ in oxe.MIXES[tri]] == [
        "bridge_dataset", "simpler_lite_pp", "fractal20220817_data",
        "fractal_drawer_cov",
    ]
