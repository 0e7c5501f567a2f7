"""Rule-based caption synthesis from SynFMC metadata.

Functionally equivalent rebuild of the reference caption machinery
(fmc/data/dataset.py:25-46 background, 248-381 visible objects/actions,
752-878 camera-type classification, 1272-1780 & 2680-2998 template assembly,
utils.py:122-142 verb morphology).  The template phrasings here are our own;
the *machinery* — metadata sources, visibility rules, RNG-driven template and
synthetic-descriptor selection, enter/exit multi-object narration — matches
the reference's structure.
"""

from __future__ import annotations

import math
import random
from typing import Optional

import numpy as np

from synfmc_tpu.data.masks import is_normal_size


# ---------------------------------------------------------------------------
# small parsing / morphology helpers (fmc/data/utils.py)
# ---------------------------------------------------------------------------


def csv_param_to_dict(param: str, split: str = ";") -> dict:
    """Parse 'k=v;k2=v2' Comment fields (utils.py:34-46)."""
    out = {}
    for item in param.split(split):
        if not item:
            continue
        key, _, value = item.partition("=")
        out[key] = value
    return out


def present_continuous(verb: str) -> str:
    """-ing form (utils.py:122-133)."""
    if verb.endswith("ie"):
        return verb[:-2] + "ying"
    if verb.endswith("e") and len(verb) > 2 and verb[-2] != "e":
        return verb[:-1] + "ing"
    if (
        len(verb) >= 3
        and verb[-1] not in "aeiou"
        and verb[-2] in "aeiou"
        and verb[-3] not in "aeiou"
    ):
        return verb + verb[-1] + "ing"
    return verb + "ing"


def third_person_singular(verb: str) -> str:
    """-s form (utils.py:136-142)."""
    if verb.endswith("y") and verb[-2] not in "aeiou":
        return verb[:-1] + "ies"
    if verb.endswith(("s", "sh", "ch", "x", "z", "o")):
        return verb + "es"
    return verb + "s"


# ---------------------------------------------------------------------------
# camera-type classification (dataset.py:833-878 get_cam_type_v2)
# ---------------------------------------------------------------------------


def get_cam_type(
    obj_xyz, obj_rot, cam_xyz,
    front_degree_limit: float = 30.0,
    left_degree_limit: float = 30.0,
    height_degree_limit: float = 30.0,
) -> str:
    """Classify the camera as front/back x left/right x top/down relative to
    the object's orientation (30-degree bands map to empty strings)."""
    obj_rot = np.asarray(obj_rot, dtype=np.float64)
    to_cam = np.asarray(cam_xyz, dtype=np.float64) - np.asarray(obj_xyz, dtype=np.float64)
    y_axis = obj_rot[:, 1]
    z_axis = obj_rot[:, 2]
    unit = to_cam / (np.linalg.norm(to_cam) + 1e-6)

    def degree(a, b):
        return math.degrees(math.acos(np.clip(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12), -1, 1)))

    deg = degree(y_axis, unit)
    front = "" if abs(90 - deg) < front_degree_limit else ("front" if deg < 90 else "back")
    if abs(deg) < left_degree_limit or abs(180 - deg) < left_degree_limit:
        left = ""
    else:
        left = "left" if np.dot(np.cross(y_axis, to_cam), z_axis) < 0 else "right"
    z_deg = degree(z_axis, unit)
    top = "" if abs(90 - z_deg) < height_degree_limit else ("top" if z_deg < 90 else "down")
    return "_".join([front, left, top])


def camera_pose_descriptions(annotation_data: dict, seen_obj_idx_list, time_idx: int) -> list[str]:
    """Per-visible-object camera type at a frame (dataset.py:752-769)."""
    cam_entry = annotation_data["camera"][time_idx]
    cam_xyz = cam_entry[:3]
    out = []
    for idx in seen_obj_idx_list:
        obj_entry = annotation_data["objects"][str(idx)][time_idx]
        obj_xyz, obj_euler = obj_entry[-3:], obj_entry[3:6]
        from synfmc_tpu.geometry import euler_to_matrix_v2

        obj_rot = euler_to_matrix_v2(obj_euler[2], obj_euler[1], obj_euler[0])
        out.append(get_cam_type(obj_xyz, obj_rot, cam_xyz))
    return out


# ---------------------------------------------------------------------------
# metadata-driven descriptions
# ---------------------------------------------------------------------------


def get_background_description(hdri_json: dict, cam_row: dict, rng: random.Random) -> str:
    """HDRI description with scene-type fallback (dataset.py:25-42)."""
    comment = csv_param_to_dict(cam_row["Comment"])
    scene_type = comment["scene_type"]
    descriptions = hdri_json.get(comment["hdri"], {}).get("descriptions", [])
    description = rng.choice(descriptions) if descriptions else ""
    if description == "":
        description = scene_type.replace("near_ground", "near ground")
    return description


def get_seen_objects(
    mask_root: str,
    asset_json: dict,
    seq_meta: dict,
    time_idx: int,
    appearance_percentage: float = 0.0015,
    max_num: Optional[int] = None,
):
    """Visible-object detection + per-object descriptions at one frame
    (dataset.py:248-381).

    Reads ``total.png`` and per-object ``{i}.png`` masks under
    ``mask_root`` (already frame-specific), applies the bbox-area visibility
    filter, and pulls object/action descriptions from the asset JSON by
    animation segment.

    Returns (seen_obj_ids, seen_obj_idxs, total_mask, obj_masks,
    obj_descriptions, action_descriptions, action_types).
    """
    import os

    from PIL import Image

    objs_seq = seq_meta["objects"]
    obj_num = len(objs_seq)
    obj_ids = [csv_param_to_dict(objs_seq[str(i)]["Comment"])["obj_id"] for i in range(obj_num)]

    total_mask = np.array(Image.open(os.path.join(mask_root, "total.png")))
    total_mask = (total_mask > 0).astype(bool)
    if total_mask.ndim == 3:
        total_mask = total_mask.any(axis=-1)
    total_mask = total_mask[..., None]

    seen_ids, seen_idxs, obj_masks = [], [], []
    if obj_num == 1:
        if is_normal_size(total_mask, percentage=appearance_percentage):
            obj_masks.append(total_mask)
            seen_ids.append(obj_ids[0])
            seen_idxs.append(0)
    else:
        for i in range(obj_num):
            m = np.array(Image.open(os.path.join(mask_root, f"{i}.png")))
            m = (m > 0).astype(bool)
            if m.ndim == 3:
                m = m.any(axis=-1)
            m = total_mask * m[..., None]
            if is_normal_size(m, percentage=appearance_percentage):
                if max_num is not None and len(seen_ids) >= max_num:
                    break
                seen_ids.append(obj_ids[i])
                seen_idxs.append(i)
                obj_masks.append(m)

    obj_descriptions, action_descriptions, action_types = [], [], []
    for obj_id in seen_ids:
        idx = obj_ids.index(obj_id)
        row = objs_seq[str(idx)]
        time_ranges = eval(row["Time_Range_List"])  # noqa: S307 — trusted dataset metadata
        seg = next(
            (k for k, (s, e) in enumerate(time_ranges) if s <= time_idx <= e), None
        )
        assert seg is not None, f"frame {time_idx} outside object time ranges {time_ranges}"
        comment = csv_param_to_dict(row["Comment"])
        animation = eval(comment["animation_name_list"])[seg]  # noqa: S307
        action_type = eval(comment["action_type_list"])[seg]  # noqa: S307
        obj_descriptions.append(asset_json[obj_id]["description"])
        action_descriptions.append(asset_json[obj_id]["animation"][animation].get("description", ""))
        action_types.append(action_type)
    return seen_ids, seen_idxs, total_mask, obj_masks, obj_descriptions, action_descriptions, action_types


# ---------------------------------------------------------------------------
# template assembly (structure parity with dataset.py:2217-2998)
# ---------------------------------------------------------------------------

ACTION_WORDS = {
    ("ground", "move"): ["walk", "run", "stride", "wander", "march"],
    ("ground", "jump"): ["jump", "leap", "hop", "bounce"],
    ("ground", "idle"): ["stand", "idle", "stay", "rest"],
    ("near_ground", "near_ground_fly"): ["hover", "glide", "drift"],
    ("near_ground", "idle"): ["hover in place", "float", "stay"],
    ("sky", "fly"): ["fly", "soar", "glide", "cruise"],
    ("sky", "idle"): ["hover", "float", "drift in place"],
    ("overwater", "move"): ["sail", "drift", "cruise", "glide over the water"],
    ("overwater", "idle"): ["float", "bob", "rest on the water"],
    ("underwater", "swim"): ["swim", "glide", "paddle"],
    ("underwater", "idle"): ["float", "hover", "drift"],
}

CAM_TYPE_PHRASES = {
    "front": "seen from the front",
    "back": "seen from behind",
    "left": "viewed from its left",
    "right": "viewed from its right",
    "top": "viewed from above",
    "down": "viewed from below",
}

OBJ_TEMPLATES = [
    "{obj} is {action}",
    "{obj} {action_s}",
    "a video of {obj} {action_ing}",
    "{obj}, {action_ing}",
]

OBJ_CAM_TEMPLATES = [
    "{obj} is {action}, {cam}",
    "{obj} {action_s}, {cam}",
    "{cam}, {obj} is {action}",
]

BACK_ASSEMBLE_SINGLE_TEMPLATE = [
    "{background}. {first_sentence}",
    "in {background}, {first_sentence}",
    "{first_sentence}. the scene is {background}",
    "set in {background}: {first_sentence}",
]

NO_BACK_ASSEMBLE_SINGLE_TEMPLATE = [
    "{first_sentence}",
    "{first_sentence}.",
]

NO_BACK_ASSEMBLE_MULTI_TEMPLATE = [
    "{first_sentence}{concat}{second_sentence}",
]

CONCAT_LIST = [", and ", ", while ", "; meanwhile ", ", as "]

ENTER_TEMPLATE = ["then {sentence} enters the view", "later {sentence} comes into view"]
EXIT_TEMPLATE = ["then {obj} leaves the view", "later {obj} moves out of sight"]
THEN_TEMPLATE = ["after that, {sentence}", "then, {sentence}", "next, {sentence}"]

DESCRIPTOR_TEMPLATE = [
    "rendered video. {sentence}",
    "synthetic video. {sentence}",
    "this video is rendered using Game Engine. {sentence}",
    "the video is synthetic. {sentence}",
    "{sentence}. note: this video is synthetically rendered",
    "generated with a game engine. {sentence}",
    "{sentence}. generated with a game engine",
    "the content of this video is rendered. {sentence}",
]

IMAGE_DESCRIPTOR_TEMPLATE = [
    "rendered image. {sentence}",
    "synthetic image. {sentence}",
    "the image is synthetic. {sentence}",
    "{sentence}. this image is rendered",
]


def action_phrase(scene_type: str, action_type: str, action_description: str, rng: random.Random) -> str:
    """Action wording: asset-provided description, else scene/action word list
    (dataset.py:2508-2570)."""
    if action_description:
        return action_description
    words = ACTION_WORDS.get((scene_type, action_type))
    if words is None:
        raise NotImplementedError(f"no action words for {(scene_type, action_type)}")
    return rng.choice(words)


def object_sentence(obj_desc: str, action: str, cam_type: str, rng: random.Random,
                    with_cam: bool = False) -> tuple[str, str]:
    """Returns (sentence, sentence_with_camera)."""
    fields = dict(
        obj=obj_desc,
        action=present_continuous(action),
        action_s=third_person_singular(action),
        action_ing=present_continuous(action),
    )
    plain = rng.choice(OBJ_TEMPLATES).format(**fields)
    cam_words = [CAM_TYPE_PHRASES[p] for p in cam_type.split("_") if p]
    if cam_words:
        cam = rng.choice(OBJ_CAM_TEMPLATES).format(cam=" and ".join(cam_words), **fields)
    else:
        cam = plain
    return plain, cam


def get_enter_exit(prev_idxs: list, cur_idxs: list) -> tuple[list, list]:
    """(dataset.py:5157-5164)"""
    enter = [i for i in cur_idxs if i not in prev_idxs]
    exit_ = [i for i in prev_idxs if i not in cur_idxs]
    return enter, exit_


def assemble_caption(
    background: str,
    per_frame_sentences: list[list[str]],
    per_frame_obj_idxs: list[list[int]],
    rng: random.Random,
    use_descriptor_prob: float = 0.9,
    is_video: bool = True,
) -> str:
    """Assemble the final caption with enter/exit narration across the chosen
    key frames and the synthetic-descriptor prefix (90% of samples,
    dataset.py:2132-2140, 5134-5151)."""
    background = background.lower()
    use_back = rng.choice([True, False])

    first = per_frame_sentences[0]
    if use_back:
        description = rng.choice(BACK_ASSEMBLE_SINGLE_TEMPLATE).format(
            background=background, first_sentence=first[0]
        )
    else:
        description = rng.choice(NO_BACK_ASSEMBLE_SINGLE_TEMPLATE).format(first_sentence=first[0])
    for s in first[1:]:
        description = rng.choice(NO_BACK_ASSEMBLE_MULTI_TEMPLATE).format(
            first_sentence=description, concat=rng.choice(CONCAT_LIST), second_sentence=s
        )

    prev_idxs = per_frame_obj_idxs[0]
    sentence_by_idx = dict(zip(per_frame_obj_idxs[0], per_frame_sentences[0]))
    for sentences, idxs in zip(per_frame_sentences[1:], per_frame_obj_idxs[1:]):
        sentence_by_idx.update(dict(zip(idxs, sentences)))
        enter, exit_ = get_enter_exit(prev_idxs, idxs)
        for i in enter:
            description += ". " + rng.choice(ENTER_TEMPLATE).format(sentence=sentence_by_idx[i])
        for i in exit_:
            description += ". " + rng.choice(EXIT_TEMPLATE).format(obj=sentence_by_idx[i])
        prev_idxs = idxs

    if rng.random() < use_descriptor_prob:
        template = rng.choice(DESCRIPTOR_TEMPLATE if is_video else IMAGE_DESCRIPTOR_TEMPLATE)
        description = template.format(sentence=description)
    return description
