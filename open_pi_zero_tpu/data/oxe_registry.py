"""Full Open-X-Embodiment registry: per-dataset camera/proprio/action
facts, standardization transforms, and the named training mixes
(reference src/data/oxe/oxe_dataset_configs.py:43-517,
oxe_standardization_transforms.py:27-969, oxe_dataset_mixes.py).

The registry facts (which keys hold which camera, how grippers are
encoded) are properties of the public OXE datasets; the transforms are
re-expressed here through shared helpers rather than one bespoke function
per dataset:

  _ee_action        concat(world_vector, rotation_delta, gripper)
  _invert_clip      clip gripper to [0,1] then flip (+1 = open convention)
  _quat_to_euler    TF quaternion(xyzw) -> roll/pitch/yaw (replaces the
                    tensorflow_graphics dependency)
  _subsample        stride a whole trajectory (Hz conversion)

Every transform leaves the trajectory in the canonical layout expected by
pipeline.make_dataset_from_rlds: action [T, A] float32 with gripper last
(+1 = open), observation.proprio [T, P], optional language_instruction.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import tensorflow as tf

from open_pi_zero_tpu.data.oxe import (
    ActionEncoding,
    ProprioEncoding,
    invert_gripper_actions,
    rel2abs_gripper_actions,
)

# --------------------------------------------------------------------------- #
# transform helpers
# --------------------------------------------------------------------------- #


def _ee_action(traj: dict, gripper: tf.Tensor) -> tf.Tensor:
    """world_vector + rotation_delta + gripper[:, None] column."""
    if len(gripper.shape) == 1:
        gripper = gripper[:, None]
    return tf.concat(
        [traj["action"]["world_vector"], traj["action"]["rotation_delta"], gripper],
        axis=-1,
    )


def _invert_clip(g: tf.Tensor) -> tf.Tensor:
    return invert_gripper_actions(tf.clip_by_value(g, 0, 1))


def _no_proprio(traj: dict) -> tf.Tensor:
    return tf.zeros((tf.shape(traj["action"])[0], 1), tf.float32)


def _blank_language(traj: dict, key: str = "natural_language_instruction"):
    src = traj["observation"].get(key, traj.get("language_instruction"))
    traj["language_instruction"] = tf.fill(tf.shape(src), "")


def _take_language(traj: dict):
    traj["language_instruction"] = traj["observation"]["natural_language_instruction"]


def _quat_to_euler(q: tf.Tensor) -> tf.Tensor:
    """[..., 4] xyzw quaternion -> [..., 3] roll/pitch/yaw (the
    tensorflow_graphics euler.from_quaternion convention)."""
    x, y, z, w = tf.unstack(q, 4, axis=-1)
    roll = tf.atan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch = tf.asin(tf.clip_by_value(2 * (w * y - z * x), -1.0, 1.0))
    yaw = tf.atan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return tf.stack([roll, pitch, yaw], axis=-1)


def _subsample(traj: dict, factor: int) -> dict:
    return tf.nest.map_structure(lambda x: x[::factor], traj)


# --------------------------------------------------------------------------- #
# per-dataset standardization transforms
# --------------------------------------------------------------------------- #


def kuka(traj):
    grip = rel2abs_gripper_actions(traj["action"]["gripper_closedness_action"][:, 0])
    traj["action"] = _ee_action(traj, grip)
    eef = tf.io.decode_raw(
        tf.io.decode_compressed(
            traj["observation"]["clip_function_input/base_pose_tool_reached"],
            compression_type="ZLIB",
        ),
        tf.float32,
    )
    gw = tf.io.decode_raw(
        tf.io.decode_compressed(
            traj["observation"]["gripper_closed"], compression_type="ZLIB"
        ),
        tf.float32,
    )
    traj["observation"]["proprio"] = tf.concat(
        [tf.reshape(eef, (-1, 7)), tf.reshape(gw, (-1, 1))], axis=-1
    )
    _blank_language(traj)
    return traj


def taco_play(traj):
    act = traj["action"]["rel_actions_world"]
    traj["action"] = tf.concat(
        [act[:, :6], tf.clip_by_value(act[:, -1:], 0, 1)], axis=-1
    )
    robs = traj["observation"]["robot_obs"]
    traj["observation"]["proprio"] = tf.concat([robs[:, :6], robs[:, 7:8]], axis=-1)
    _take_language(traj)
    return traj


def jaco_play(traj):
    grip = rel2abs_gripper_actions(traj["action"]["gripper_closedness_action"][:, 0])
    wv = traj["action"]["world_vector"]
    traj["action"] = tf.concat([wv, tf.zeros_like(wv), grip[:, None]], axis=-1)
    traj["observation"]["proprio"] = traj["observation"]["end_effector_cartesian_pos"]
    _take_language(traj)
    return traj


def berkeley_cable_routing(traj):
    traj["action"] = _ee_action(
        traj, tf.zeros_like(traj["action"]["world_vector"][:, :1])
    )
    traj["observation"]["proprio"] = traj["observation"]["robot_state"]
    _blank_language(traj)
    return traj


def roboturk(traj):
    grip = _invert_clip(traj["action"]["gripper_closedness_action"])
    traj["action"] = _ee_action(traj, grip)
    traj["observation"]["proprio"] = _no_proprio(traj)
    _blank_language(traj)
    return traj


def nyu_door_opening(traj):
    grip = rel2abs_gripper_actions(traj["action"]["gripper_closedness_action"][:, 0])
    traj["action"] = _ee_action(traj, grip)
    traj["observation"]["proprio"] = _no_proprio(traj)
    _blank_language(traj)
    return traj


def viola(traj):
    grip = _invert_clip(traj["action"]["gripper_closedness_action"][:, None])
    traj["action"] = _ee_action(traj, grip)
    traj["observation"]["proprio"] = tf.concat(
        [traj["observation"]["joint_states"], traj["observation"]["gripper_states"]],
        axis=-1,
    )
    _blank_language(traj)
    return traj


def berkeley_autolab_ur5(traj):
    traj["observation"]["depth"] = traj["observation"].pop("image_with_depth")
    grip = rel2abs_gripper_actions(traj["action"]["gripper_closedness_action"])
    traj["action"] = _ee_action(traj, grip)
    traj["observation"]["proprio"] = traj["observation"]["robot_state"][:, 6:14]
    _take_language(traj)
    return traj


def toto(traj):
    traj["action"] = _ee_action(
        traj, tf.cast(traj["action"]["open_gripper"][:, None], tf.float32)
    )
    traj["observation"]["proprio"] = traj["observation"]["state"]
    _blank_language(traj)
    return traj


def language_table(traj):
    act = traj["action"]
    traj["action"] = tf.concat(
        [act, tf.zeros_like(act), tf.zeros_like(act), tf.ones_like(act[:, :1])],
        axis=-1,
    )
    traj["observation"]["proprio"] = traj["observation"]["effector_translation"]
    # instructions are stored as padded unicode codepoints
    encoded = tf.strings.unicode_encode(
        traj["observation"]["instruction"], output_encoding="UTF-8"
    )
    traj["language_instruction"] = tf.strings.split(encoded, "\x00")[:, :1].to_tensor()[
        :, 0
    ]
    return traj


def pusht(traj):
    traj["action"] = _ee_action(
        traj, traj["action"]["gripper_closedness_action"][:, None]
    )
    traj["observation"]["proprio"] = traj["observation"]["robot_state"]
    _take_language(traj)
    return traj


def stanford_kuka_multimodal(traj):
    traj["observation"]["depth_image"] = traj["observation"]["depth_image"][..., 0]
    act = traj["action"]
    traj["action"] = tf.concat(
        [act[:, :3], tf.zeros_like(act[:, :3]), act[:, -1:]], axis=-1
    )
    traj["observation"]["proprio"] = tf.concat(
        [traj["observation"]["ee_position"], traj["observation"]["ee_orientation"]],
        axis=-1,
    )
    return traj


def nyu_rot(traj):
    traj["action"] = traj["action"][..., :7]
    traj["observation"]["proprio"] = traj["observation"]["state"]
    return traj


def stanford_hydra(traj):
    traj["action"] = tf.concat(
        [traj["action"][:, :6], invert_gripper_actions(traj["action"][:, -1:])],
        axis=-1,
    )
    st = traj["observation"]["state"]
    traj["observation"]["proprio"] = tf.concat(
        [st[:, :3], st[:, 7:10], st[:, -3:-2]], axis=-1
    )
    traj["language_instruction"] = tf.fill(tf.shape(traj["language_instruction"]), "")
    return traj


def _invert_clip_last_dim_state_proprio(traj, proprio_slice):
    traj["action"] = tf.concat(
        [traj["action"][:, :6], _invert_clip(traj["action"][:, -1:])], axis=-1
    )
    traj["observation"]["proprio"] = traj["observation"]["state"][:, proprio_slice]
    traj["language_instruction"] = tf.fill(tf.shape(traj["language_instruction"]), "")
    return traj


def austin_buds(traj):
    return _invert_clip_last_dim_state_proprio(traj, slice(None, 8))


def nyu_franka_play(traj):
    traj["observation"]["depth"] = tf.cast(
        traj["observation"]["depth"][..., 0], tf.float32
    )
    traj["observation"]["depth_additional_view"] = tf.cast(
        traj["observation"]["depth_additional_view"][..., 0], tf.float32
    )
    act = traj["action"]
    traj["action"] = tf.concat(
        [act[:, -8:-2], tf.clip_by_value(act[:, -2:-1], 0, 1)], axis=-1
    )
    traj["observation"]["proprio"] = traj["observation"]["state"][:, -6:]
    traj["language_instruction"] = tf.fill(tf.shape(traj["language_instruction"]), "")
    return traj


def maniskill(traj):
    traj["observation"]["proprio"] = tf.concat(
        [traj["observation"]["tcp_pose"], traj["observation"]["state"][:, 7:8]],
        axis=-1,
    )
    return traj


def furniture_bench(traj):
    act = traj["action"]
    traj["action"] = tf.concat(
        [act[:, :3], _quat_to_euler(act[:, 3:7]), _invert_clip(act[:, -1:])], axis=-1
    )
    st = traj["observation"]["state"]
    traj["observation"]["proprio"] = tf.concat([st[:, :7], st[:, -1:]], axis=-1)
    return traj


def cmu_franka_exploration(traj):
    traj["action"] = traj["action"][..., :-1]
    traj["observation"]["proprio"] = _no_proprio(traj)
    return traj


def ucsd_kitchen(traj):
    traj["action"] = traj["action"][..., :-1]
    traj["observation"]["proprio"] = traj["observation"]["state"][:, :7]
    return traj


def ucsd_pick_place(traj):
    act = traj["action"]
    traj["action"] = tf.concat(
        [act[:, :3], tf.zeros_like(act[:, :3]), act[:, -1:]], axis=-1
    )
    traj["observation"]["proprio"] = traj["observation"]["state"]
    return traj


def austin_sailor(traj):
    return _invert_clip_last_dim_state_proprio(traj, slice(None))


def austin_sirius(traj):
    return _invert_clip_last_dim_state_proprio(traj, slice(None))


def bc_z(traj):
    traj["action"] = tf.concat(
        [
            traj["action"]["future/xyz_residual"][:, :3],
            traj["action"]["future/axis_angle_residual"][:, :3],
            invert_gripper_actions(
                tf.cast(traj["action"]["future/target_close"][:, :1], tf.float32)
            ),
        ],
        axis=-1,
    )
    traj["observation"]["proprio"] = tf.concat(
        [
            traj["observation"]["present/xyz"],
            traj["observation"]["present/axis_angle"],
            traj["observation"]["present/sensed_close"],
        ],
        axis=-1,
    )
    _take_language(traj)
    return traj


def utokyo_pr2(traj):
    traj["action"] = traj["action"][..., :-1]
    traj["observation"]["proprio"] = traj["observation"]["state"]
    return traj


def utokyo_xarm_pick_place(traj):
    return traj


def utokyo_xarm_bimanual(traj):
    traj["action"] = traj["action"][..., -7:]
    traj["observation"]["proprio"] = traj["observation"]["end_effector_pose"]
    return traj


def robo_net(traj):
    act = traj["action"]
    traj["action"] = tf.concat(
        [act[:, :4], tf.zeros_like(act[:, :2]), act[:, -1:]], axis=-1
    )
    st = traj["observation"]["state"]
    traj["observation"]["proprio"] = tf.concat(
        [st[:, :4], tf.zeros_like(st[:, :2]), st[:, -1:]], axis=-1
    )
    return traj


def berkeley_mvp(traj):
    traj["observation"]["proprio"] = tf.concat(
        [
            traj["observation"]["pose"],
            tf.cast(traj["observation"]["gripper"], tf.float32)[:, None],
        ],
        axis=-1,
    )
    traj["action"] = tf.concat(
        [traj["action"][:, :-1], invert_gripper_actions(traj["action"][:, -1:])],
        axis=1,
    )
    return traj


def berkeley_rpt(traj):
    # 30Hz -> 10Hz, then recompute joint-delta actions on the downsample
    traj = _subsample(traj, 3)
    traj["observation"]["proprio"] = tf.concat(
        [
            traj["observation"]["joint_pos"],
            tf.cast(traj["observation"]["gripper"], tf.float32)[:, None],
        ],
        axis=-1,
    )
    jp = traj["observation"]["joint_pos"]
    joint_actions = jp[1:, :7] - jp[:-1, :7]
    out = tf.nest.map_structure(lambda x: x[:-1], traj)
    out["action"] = tf.concat(
        [joint_actions, invert_gripper_actions(traj["action"][:-1, -1:])], axis=1
    )
    return out


def kaist_nonprehensile(traj):
    traj["action"] = tf.concat(
        [traj["action"][:, :6], tf.zeros_like(traj["action"][:, :1])], axis=-1
    )
    traj["observation"]["proprio"] = traj["observation"]["state"][:, -7:]
    return traj


def stanford_mask_vit(traj):
    act = traj["action"]
    traj["action"] = tf.concat(
        [act[:, :4], tf.zeros_like(act[:, :2]), act[:, -1:]], axis=-1
    )
    eep = traj["observation"]["end_effector_pose"]
    traj["observation"]["proprio"] = tf.concat(
        [eep[:, :4], tf.zeros_like(eep[:, :2]), eep[:, -1:]], axis=-1
    )
    return traj


def tokyo_lsmo(traj):
    st = traj["observation"]["state"]
    traj["observation"]["proprio"] = tf.concat([st[:, :6], st[:, -1:]], axis=-1)
    return traj


def dlr_sara_pour(traj):
    traj["observation"]["proprio"] = traj["observation"]["state"]
    return traj


def dlr_sara_grid_clamp(traj):
    traj["observation"]["proprio"] = traj["observation"]["state"][:, :6]
    return traj


def dlr_edan_shared_control(traj):
    traj["action"] = tf.concat(
        [traj["action"][:, :6], invert_gripper_actions(traj["action"][:, -1:])],
        axis=-1,
    )
    traj["observation"]["proprio"] = traj["observation"]["state"]
    return traj


def asu_table_top(traj):
    traj["observation"]["proprio"] = tf.concat(
        [traj["ground_truth_states"]["EE"], traj["observation"]["state"][:, -1:]],
        axis=-1,
    )
    return traj


def robocook(traj):
    traj["observation"]["proprio"] = traj["observation"]["state"]
    return traj


def imperial_wristcam(traj):
    traj["action"] = traj["action"][..., :-1]
    traj["observation"]["proprio"] = _no_proprio(traj)
    return traj


def iamlab_pick_insert(traj):
    act = traj["action"]
    traj["action"] = tf.concat(
        [act[:, :3], _quat_to_euler(act[:, 3:7]), act[:, 7:8]], axis=-1
    )
    st = traj["observation"]["state"]
    traj["observation"]["proprio"] = tf.concat([st[:, :7], st[:, 7:8]], axis=-1)
    return traj


def uiuc_d3field(traj):
    act = traj["action"]
    traj["action"] = tf.concat(
        [act, tf.zeros_like(act), tf.zeros_like(act[:, :1])], axis=-1
    )
    traj["observation"]["proprio"] = _no_proprio(traj)
    return traj


def utaustin_mutex(traj):
    return _invert_clip_last_dim_state_proprio(traj, slice(None, 8))


def berkeley_fanuc(traj):
    st = traj["observation"]["state"]
    traj["action"] = tf.concat(
        [traj["action"], invert_gripper_actions(st[:, 6:7])], axis=-1
    )
    traj["observation"]["proprio"] = tf.concat([st[:, :6], st[:, 6:7]], axis=-1)
    return traj


def cmu_playing_with_food(traj):
    act = traj["action"]
    traj["action"] = tf.concat(
        [act[:, :3], _quat_to_euler(act[:, 3:7]), act[:, -1:]], axis=-1
    )
    traj["observation"]["proprio"] = traj["observation"]["state"]
    return traj


def playfusion(traj):
    traj["action"] = tf.concat(
        [traj["action"][:, :3], traj["action"][:, -4:]], axis=-1
    )
    traj["observation"]["proprio"] = traj["observation"]["state"]
    return traj


def cmu_stretch(traj):
    traj["action"] = traj["action"][..., :-1]
    st = traj["observation"]["state"]
    traj["observation"]["proprio"] = tf.concat(
        [st[:, :3], tf.zeros_like(st[:, :3]), st[:, -1:]], axis=-1
    )
    return traj


def gnm(traj):
    """Navigation: subsample 3x, recompute body-frame XY waypoint actions
    from positions + yaw, rescale by the dataset's step length."""

    def subsampled():
        scale = tf.linalg.norm(traj["action"][0]) / tf.linalg.norm(
            traj["observation"]["position"][1] - traj["observation"]["position"][0]
        )
        t = _subsample(traj, 3)
        yaw = t["observation"]["yaw"]
        pos = t["observation"]["position"]
        rot = tf.convert_to_tensor(
            [[tf.cos(yaw), -tf.sin(yaw)], [tf.sin(yaw), tf.cos(yaw)]]
        )
        rot = tf.transpose(rot, [3, 2, 0, 1])[0]
        delta = pos[1:] - pos[:-1]
        action = tf.matmul(delta[:, None], rot[:-1])[:, 0] * scale
        t = tf.nest.map_structure(lambda x: x[:-1], t)
        t["action"] = action
        return t

    def empty():
        return tf.nest.map_structure(lambda x: x[:0], traj)

    out = tf.cond(tf.shape(traj["action"])[0] > 1, subsampled, empty)
    out["observation"]["proprio"] = out["observation"]["state"]
    return out


def aloha(traj):
    traj = _subsample(traj, 5)  # 50Hz -> 10Hz
    traj["observation"]["proprio"] = traj["observation"]["state"]
    return traj


def fmb(traj):
    traj["observation"]["proprio"] = tf.concat(
        [
            traj["observation"]["eef_pose"],
            traj["observation"]["state_gripper_pose"][..., None],
        ],
        axis=-1,
    )
    return traj


def dobbe(traj):
    traj["observation"]["proprio"] = traj["observation"]["state"]
    return traj


def roboset(traj):
    traj["observation"]["proprio"] = traj["observation"]["state"]
    traj["action"] = tf.concat(
        [traj["action"][:, :7], _invert_clip(traj["action"][:, -1:])], axis=-1
    )
    return traj


def rh20t(traj):
    traj["action"] = tf.concat(
        [
            traj["action"]["tcp_base"],
            tf.cast(traj["action"]["gripper"][:, None], tf.float32),
        ],
        axis=-1,
    )
    traj["observation"]["proprio"] = tf.concat(
        [
            traj["observation"]["tcp_base"],
            traj["observation"]["gripper_width"][..., None],
        ],
        axis=-1,
    )
    return traj


def mujoco_manip(traj):
    grip = invert_gripper_actions(traj["action"][:, -1:] / 255)
    traj["action"] = tf.concat([traj["action"][:, :6], grip], axis=-1)
    return traj


# --------------------------------------------------------------------------- #
# dataset facts table (compact): (primary, secondary, wrist) images,
# optional (primary, secondary, wrist) depths, proprio/action encodings
# --------------------------------------------------------------------------- #

PE, AE = ProprioEncoding, ActionEncoding


def _entry(primary, secondary, wrist, pe, ae, depth=(None, None, None), fn=None):
    return {
        "image_obs_keys": {"primary": primary, "secondary": secondary, "wrist": wrist},
        "depth_obs_keys": {"primary": depth[0], "secondary": depth[1], "wrist": depth[2]},
        "proprio_encoding": pe,
        "action_encoding": ae,
        "standardize_fn": fn,
    }


EXTENDED_REGISTRY: Dict[str, dict] = {
    "kuka": _entry("image", None, None, PE.POS_QUAT, AE.EEF_POS, fn=kuka),
    "taco_play": _entry(
        "rgb_static", None, "rgb_gripper", PE.POS_EULER, AE.EEF_POS,
        depth=("depth_static", None, "depth_gripper"), fn=taco_play,
    ),
    "jaco_play": _entry("image", None, "image_wrist", PE.POS_EULER, AE.EEF_POS, fn=jaco_play),
    "berkeley_cable_routing": _entry(
        "image", "top_image", "wrist45_image", PE.JOINT, AE.EEF_POS,
        fn=berkeley_cable_routing,
    ),
    "roboturk": _entry("front_rgb", None, None, PE.NONE, AE.EEF_POS, fn=roboturk),
    "nyu_door_opening_surprising_effectiveness": _entry(
        None, None, "image", PE.NONE, AE.EEF_POS, fn=nyu_door_opening
    ),
    "viola": _entry(
        "agentview_rgb", None, "eye_in_hand_rgb", PE.JOINT, AE.EEF_POS, fn=viola
    ),
    "berkeley_autolab_ur5": _entry(
        "image", None, "hand_image", PE.POS_QUAT, AE.EEF_POS,
        depth=("depth", None, None), fn=berkeley_autolab_ur5,
    ),
    "toto": _entry("image", None, None, PE.JOINT, AE.EEF_POS, fn=toto),
    "language_table": _entry("rgb", None, None, PE.POS_EULER, AE.EEF_POS, fn=language_table),
    "columbia_cairlab_pusht_real": _entry(
        "image", None, "wrist_image", PE.POS_EULER, AE.EEF_POS, fn=pusht
    ),
    "stanford_kuka_multimodal_dataset_converted_externally_to_rlds": _entry(
        "image", None, None, PE.POS_QUAT, AE.EEF_POS,
        depth=("depth_image", None, None), fn=stanford_kuka_multimodal,
    ),
    "nyu_rot_dataset_converted_externally_to_rlds": _entry(
        "image", None, None, PE.POS_EULER, AE.EEF_POS, fn=nyu_rot
    ),
    "stanford_hydra_dataset_converted_externally_to_rlds": _entry(
        "image", None, "wrist_image", PE.POS_EULER, AE.EEF_POS, fn=stanford_hydra
    ),
    "austin_buds_dataset_converted_externally_to_rlds": _entry(
        "image", None, "wrist_image", PE.JOINT, AE.EEF_POS, fn=austin_buds
    ),
    "nyu_franka_play_dataset_converted_externally_to_rlds": _entry(
        "image", "image_additional_view", None, PE.POS_EULER, AE.EEF_POS,
        depth=("depth", "depth_additional_view", None), fn=nyu_franka_play,
    ),
    "maniskill_dataset_converted_externally_to_rlds": _entry(
        "image", None, "wrist_image", PE.POS_QUAT, AE.EEF_POS,
        depth=("depth", None, "wrist_depth"), fn=maniskill,
    ),
    "furniture_bench_dataset_converted_externally_to_rlds": _entry(
        "image", None, "wrist_image", PE.POS_QUAT, AE.EEF_POS, fn=furniture_bench
    ),
    "cmu_franka_exploration_dataset_converted_externally_to_rlds": _entry(
        "highres_image", None, None, PE.NONE, AE.EEF_POS, fn=cmu_franka_exploration
    ),
    "ucsd_kitchen_dataset_converted_externally_to_rlds": _entry(
        "image", None, None, PE.JOINT, AE.EEF_POS, fn=ucsd_kitchen
    ),
    "ucsd_pick_and_place_dataset_converted_externally_to_rlds": _entry(
        "image", None, None, PE.POS_EULER, AE.EEF_POS, fn=ucsd_pick_place
    ),
    "austin_sailor_dataset_converted_externally_to_rlds": _entry(
        "image", None, "wrist_image", PE.POS_QUAT, AE.EEF_POS, fn=austin_sailor
    ),
    "austin_sirius_dataset_converted_externally_to_rlds": _entry(
        "image", None, "wrist_image", PE.POS_QUAT, AE.EEF_POS, fn=austin_sirius
    ),
    "bc_z": _entry("image", None, None, PE.POS_EULER, AE.EEF_POS, fn=bc_z),
    "utokyo_pr2_opening_fridge_converted_externally_to_rlds": _entry(
        "image", None, None, PE.POS_EULER, AE.EEF_POS, fn=utokyo_pr2
    ),
    "utokyo_pr2_tabletop_manipulation_converted_externally_to_rlds": _entry(
        "image", None, None, PE.POS_EULER, AE.EEF_POS, fn=utokyo_pr2
    ),
    "utokyo_xarm_pick_and_place_converted_externally_to_rlds": _entry(
        "image", "image2", "hand_image", PE.POS_EULER, AE.EEF_POS,
        fn=utokyo_xarm_pick_place,
    ),
    "utokyo_xarm_bimanual_converted_externally_to_rlds": _entry(
        "image", None, None, PE.POS_EULER, AE.EEF_POS, fn=utokyo_xarm_bimanual
    ),
    "robo_net": _entry("image", "image1", None, PE.POS_EULER, AE.EEF_POS, fn=robo_net),
    "berkeley_mvp_converted_externally_to_rlds": _entry(
        None, None, "hand_image", PE.POS_QUAT, AE.JOINT_POS, fn=berkeley_mvp
    ),
    "berkeley_rpt_converted_externally_to_rlds": _entry(
        None, None, "hand_image", PE.JOINT, AE.JOINT_POS, fn=berkeley_rpt
    ),
    "kaist_nonprehensile_converted_externally_to_rlds": _entry(
        "image", None, None, PE.POS_QUAT, AE.EEF_POS, fn=kaist_nonprehensile
    ),
    "stanford_mask_vit_converted_externally_to_rlds": _entry(
        "image", None, None, PE.POS_EULER, AE.EEF_POS, fn=stanford_mask_vit
    ),
    "tokyo_u_lsmo_converted_externally_to_rlds": _entry(
        "image", None, None, PE.POS_EULER, AE.EEF_POS, fn=tokyo_lsmo
    ),
    "dlr_sara_pour_converted_externally_to_rlds": _entry(
        "image", None, None, PE.POS_EULER, AE.EEF_POS, fn=dlr_sara_pour
    ),
    "dlr_sara_grid_clamp_converted_externally_to_rlds": _entry(
        "image", None, None, PE.POS_EULER, AE.EEF_POS, fn=dlr_sara_grid_clamp
    ),
    "dlr_edan_shared_control_converted_externally_to_rlds": _entry(
        "image", None, None, PE.POS_EULER, AE.EEF_POS, fn=dlr_edan_shared_control
    ),
    "asu_table_top_converted_externally_to_rlds": _entry(
        "image", None, None, PE.POS_EULER, AE.EEF_POS, fn=asu_table_top
    ),
    "stanford_robocook_converted_externally_to_rlds": _entry(
        "image_1", "image_2", None, PE.POS_EULER, AE.EEF_POS,
        depth=("depth_1", "depth_2", None), fn=robocook,
    ),
    "imperialcollege_sawyer_wrist_cam": _entry(
        "image", None, "wrist_image", PE.NONE, AE.EEF_POS, fn=imperial_wristcam
    ),
    "iamlab_cmu_pickup_insert_converted_externally_to_rlds": _entry(
        "image", None, "wrist_image", PE.JOINT, AE.EEF_POS, fn=iamlab_pick_insert
    ),
    "uiuc_d3field": _entry(
        "image_1", "image_2", None, PE.NONE, AE.EEF_POS,
        depth=("depth_1", "depth_2", None), fn=uiuc_d3field,
    ),
    "utaustin_mutex": _entry(
        "image", None, "wrist_image", PE.JOINT, AE.EEF_POS, fn=utaustin_mutex
    ),
    "berkeley_fanuc_manipulation": _entry(
        "image", None, "wrist_image", PE.JOINT, AE.EEF_POS, fn=berkeley_fanuc
    ),
    "cmu_playing_with_food": _entry(
        "image", None, "finger_vision_1", PE.POS_EULER, AE.EEF_POS,
        fn=cmu_playing_with_food,
    ),
    "cmu_play_fusion": _entry("image", None, None, PE.JOINT, AE.EEF_POS, fn=playfusion),
    "cmu_stretch": _entry("image", None, None, PE.POS_EULER, AE.EEF_POS, fn=cmu_stretch),
    "gnm_dataset": _entry("image", None, None, PE.POS_NAV, AE.NAV_2D, fn=gnm),
    "aloha_static_dataset": _entry(
        "cam_high", "cam_low", "cam_right_wrist", PE.JOINT_BIMANUAL,
        AE.JOINT_POS_BIMANUAL, fn=aloha,
    ),
    "aloha_dagger_dataset": _entry(
        "cam_high", "cam_low", "cam_right_wrist", PE.JOINT_BIMANUAL,
        AE.JOINT_POS_BIMANUAL, fn=aloha,
    ),
    "aloha_mobile_dataset": _entry(
        "cam_high", None, "cam_right_wrist", PE.JOINT_BIMANUAL,
        AE.JOINT_POS_BIMANUAL_NAV, fn=aloha,
    ),
    "fmb_dataset": _entry(
        "image_side_1", "image_side_2", "image_wrist_1", PE.POS_EULER, AE.EEF_POS,
        depth=("image_side_1_depth", "image_side_2_depth", "image_wrist_1_depth"),
        fn=fmb,
    ),
    "dobbe": _entry(None, None, "wrist_image", PE.POS_EULER, AE.EEF_POS, fn=dobbe),
    "roboset": _entry(
        "image_left", "image_right", "image_wrist", PE.JOINT, AE.JOINT_POS, fn=roboset
    ),
    "rh20t": _entry(
        "image_front", "image_side_right", "image_wrist", PE.POS_EULER, AE.EEF_POS,
        fn=rh20t,
    ),
    "mujoco_manip": _entry("image", None, None, PE.POS_EULER, AE.EEF_POS, fn=mujoco_manip),
}


# --------------------------------------------------------------------------- #
# named mixes (reference oxe_dataset_mixes.py — weights are part of the
# published recipes)
# --------------------------------------------------------------------------- #

RT_X_MIX: List[Tuple[str, float]] = [
    ("fractal20220817_data", 0.54087122203),
    ("kuka", 0.8341046294),
    ("bridge_dataset", 1.0),
    ("taco_play", 2.0),
    ("jaco_play", 2.0),
    ("berkeley_cable_routing", 3.0),
    ("roboturk", 1.0),
    ("nyu_door_opening_surprising_effectiveness", 5.0),
    ("viola", 2.0),
    ("berkeley_autolab_ur5", 1.0),
    ("toto", 1.0),
]

OXE_FRANKA_MIX: List[Tuple[str, float]] = [
    ("taco_play", 1.0),
    ("berkeley_cable_routing", 1.0),
    ("viola", 1.0),
    ("toto", 1.0),
    ("stanford_hydra_dataset_converted_externally_to_rlds", 1.0),
    ("austin_buds_dataset_converted_externally_to_rlds", 3.0),
    ("nyu_franka_play_dataset_converted_externally_to_rlds", 3.0),
    ("maniskill_dataset_converted_externally_to_rlds", 0.1),
    ("furniture_bench_dataset_converted_externally_to_rlds", 0.1),
    ("cmu_franka_exploration_dataset_converted_externally_to_rlds", 5.0),
    ("austin_sailor_dataset_converted_externally_to_rlds", 1.0),
    ("austin_sirius_dataset_converted_externally_to_rlds", 1.0),
    ("berkeley_rpt_converted_externally_to_rlds", 1.0),
    ("kaist_nonprehensile_converted_externally_to_rlds", 3.0),
    ("stanford_robocook_converted_externally_to_rlds", 1.0),
    ("iamlab_cmu_pickup_insert_converted_externally_to_rlds", 1.0),
    ("utaustin_mutex", 1.0),
    ("cmu_play_fusion", 1.0),
]

OXE_MAGIC_SOUP: List[Tuple[str, float]] = [
    ("fractal20220817_data", 0.54087122203),
    ("kuka", 0.8341046294),
    ("bridge_dataset", 1.0),
    ("taco_play", 2.0),
    ("jaco_play", 1.0),
    ("berkeley_cable_routing", 1.0),
    ("roboturk", 2.0),
    ("nyu_door_opening_surprising_effectiveness", 1.0),
    ("viola", 2.0),
    ("berkeley_autolab_ur5", 2.0),
    ("toto", 1.0),
    ("language_table", 0.1),
    ("stanford_hydra_dataset_converted_externally_to_rlds", 2.0),
    ("austin_buds_dataset_converted_externally_to_rlds", 1.0),
    ("nyu_franka_play_dataset_converted_externally_to_rlds", 3.0),
    ("furniture_bench_dataset_converted_externally_to_rlds", 0.1),
    ("ucsd_kitchen_dataset_converted_externally_to_rlds", 2.0),
    ("austin_sailor_dataset_converted_externally_to_rlds", 1.0),
    ("austin_sirius_dataset_converted_externally_to_rlds", 1.0),
    ("bc_z", 0.2),
    ("dlr_edan_shared_control_converted_externally_to_rlds", 1.0),
    ("iamlab_cmu_pickup_insert_converted_externally_to_rlds", 1.0),
    ("utaustin_mutex", 1.0),
    ("berkeley_fanuc_manipulation", 2.0),
    ("cmu_stretch", 1.0),
]

OXE_FLEX_ACT_SOUP: List[Tuple[str, float]] = OXE_MAGIC_SOUP[:19] + [
    ("bc_z", 0.2),
    ("berkeley_mvp_converted_externally_to_rlds", 1.0),
    ("dlr_edan_shared_control_converted_externally_to_rlds", 1.0),
    ("iamlab_cmu_pickup_insert_converted_externally_to_rlds", 1.0),
    ("utaustin_mutex", 1.0),
    ("berkeley_fanuc_manipulation", 2.0),
    ("cmu_stretch", 1.0),
    ("gnm_dataset", 1.0),
    ("aloha_static_dataset", 3.0),
    ("aloha_mobile_dataset", 2.0),
    ("dobbe", 1.0),
    ("roboset", 0.5),
    ("rh20t", 0.5),
]

OXE_FULL_MIX: List[Tuple[str, float]] = [
    (name, 1.0)
    for name in [
        "fractal20220817_data", "kuka", "bridge_dataset", "taco_play", "jaco_play",
        "berkeley_cable_routing", "roboturk",
        "nyu_door_opening_surprising_effectiveness", "viola",
        "berkeley_autolab_ur5", "toto", "language_table",
        "columbia_cairlab_pusht_real",
        "stanford_kuka_multimodal_dataset_converted_externally_to_rlds",
        "nyu_rot_dataset_converted_externally_to_rlds",
        "stanford_hydra_dataset_converted_externally_to_rlds",
        "austin_buds_dataset_converted_externally_to_rlds",
        "nyu_franka_play_dataset_converted_externally_to_rlds",
        "maniskill_dataset_converted_externally_to_rlds",
        "furniture_bench_dataset_converted_externally_to_rlds",
        "cmu_franka_exploration_dataset_converted_externally_to_rlds",
        "ucsd_kitchen_dataset_converted_externally_to_rlds",
        "ucsd_pick_and_place_dataset_converted_externally_to_rlds",
        "austin_sailor_dataset_converted_externally_to_rlds",
        "austin_sirius_dataset_converted_externally_to_rlds", "bc_z",
        "utokyo_pr2_opening_fridge_converted_externally_to_rlds",
        "utokyo_pr2_tabletop_manipulation_converted_externally_to_rlds",
        "utokyo_xarm_pick_and_place_converted_externally_to_rlds",
        "utokyo_xarm_bimanual_converted_externally_to_rlds", "robo_net",
        "berkeley_mvp_converted_externally_to_rlds",
        "berkeley_rpt_converted_externally_to_rlds",
        "kaist_nonprehensile_converted_externally_to_rlds",
        "stanford_mask_vit_converted_externally_to_rlds",
        "tokyo_u_lsmo_converted_externally_to_rlds",
        "dlr_sara_pour_converted_externally_to_rlds",
        "dlr_sara_grid_clamp_converted_externally_to_rlds",
        "dlr_edan_shared_control_converted_externally_to_rlds",
        "asu_table_top_converted_externally_to_rlds",
        "stanford_robocook_converted_externally_to_rlds",
        "imperialcollege_sawyer_wrist_cam",
        "iamlab_cmu_pickup_insert_converted_externally_to_rlds", "uiuc_d3field",
        "utaustin_mutex", "berkeley_fanuc_manipulation", "cmu_playing_with_food",
        "cmu_play_fusion", "cmu_stretch", "gnm_dataset",
    ]
]

EXTENDED_MIXES: Dict[str, List[Tuple[str, float]]] = {
    "rtx": RT_X_MIX,
    "rtx_franka": RT_X_MIX + OXE_FRANKA_MIX,
    "oxe_franka": OXE_FRANKA_MIX,
    "oxe_magic_soup": OXE_MAGIC_SOUP,
    "oxe_flex_act_soup": OXE_FLEX_ACT_SOUP,
    "oxe_full": OXE_FULL_MIX,
}
