"""Caption-machinery tests: reference-scale template families, enter/exit +
THEN narration, verb lemmatization, descriptor distribution, diversity.

Family-size floors mirror the reference counts (fmc/data/dataset.py:
1115-1204 object/camera/background families, 2217-2270 enter/exit/then).
"""

import random

import pytest

from synfmc_tpu.data import captions as C


def _keyframes(idx_sets, act_types=None):
    kfs = []
    for i, idxs in enumerate(idx_sets):
        n = len(idxs)
        kfs.append(
            dict(
                seen_idxs=list(idxs),
                obj_descs=[f"toy robot {j}" for j in idxs],
                act_descs=["" for _ in idxs],
                act_types=[(act_types[i] if act_types else "move") for _ in idxs],
                cam_types=["front_left_" for _ in idxs],
            )
        )
    return kfs


def test_template_family_sizes_match_reference_scale():
    assert len(C.ADJ_OBJ_TEMPLATE) >= 3
    assert len(C.NO_ADJ_OBJ_TEMPLATE) >= 2
    assert len(C.ADJ_CAM_TEMPLATE) >= 6          # ref dataset.py:1128-1154
    assert len(C.NO_ADJ_CAM_TEMPLATE) >= 3
    assert len(C.BACK_ASSEMBLE_SINGLE_TEMPLATE) >= 12  # ref 1157-1172
    assert len(C.OBJ_CONCAT_LIST) >= 4           # ref 2217-2222
    assert len(C.ENTER_TEMPLATE) >= 9            # ref 2225-2235
    assert len(C.EXIT_TEMPLATE) >= 10            # ref 2239-2250
    assert len(C.THEN_TEMPLATE) >= 7             # ref 2253-2261
    assert len(C.ENTER_EXIT_CONCAT_LIST) >= 8    # ref 2263-2270
    assert len(C.DESCRIPTOR_TEMPLATE) == 14      # adopted verbatim, ref 1187-1204
    # every scene/action pair carries a reference-scale word list
    for key, words in C.ACTION_WORDS.items():
        floor = 2 if key == ("ground", "jump") else 5
        assert len(words) >= floor, (key, words)
    # placeholders are well-formed
    for t in C.THEN_TEMPLATE:
        assert "{sentence_1}" in t and "{sentence_2}" in t
    for t in C.ENTER_TEMPLATE + C.EXIT_TEMPLATE:
        assert "{objects}" in t
    for t in C.DESCRIPTOR_TEMPLATE + C.BACK_ASSEMBLE_SINGLE_TEMPLATE:
        assert "{" in t and "}" in t


def test_lemmatize_verb():
    assert C.lemmatize_verb("running") == "run"
    assert C.lemmatize_verb("moving") == "move"
    assert C.lemmatize_verb("gliding") == "glide"
    assert C.lemmatize_verb("flies") == "fly"
    assert C.lemmatize_verb("walks") == "walk"
    assert C.lemmatize_verb("swam") == "swim"
    assert C.lemmatize_verb("hopping") == "hop"
    assert C.lemmatize_verb("rolling") == "roll"
    assert C.lemmatize_verb("jump") == "jump"
    assert C.lemmatize_verb("waves hands") == "waves hands"  # phrases untouched


def test_enter_exit_then_narration_in_multi_captions():
    rng = random.Random(0)
    # object 1 exits after kf0, object 2 enters at kf2 -> enter+exit+THEN text
    kfs = _keyframes([[0, 1], [0], [0, 2], [2]])
    caption, _ = C.assemble_video_caption(
        "ground", "a meadow", kfs, is_multi=True, rng=rng,
        use_descriptor_prob=0.0, is_track_single=False,
    )
    enter_markers = [t.split("{objects}")[-1] for t in C.ENTER_TEMPLATE]
    exit_markers = [t.split("{objects}")[-1] for t in C.EXIT_TEMPLATE]
    assert any(m and m in caption for m in enter_markers), caption
    assert any(m and m in caption for m in exit_markers), caption
    then_markers = [t.split("{sentence_1}")[1].split("{sentence_2}")[0] for t in C.THEN_TEMPLATE]
    assert any(m in caption for m in then_markers), caption


def test_action_change_then_narration_single_track():
    rng = random.Random(1)
    kfs = _keyframes([[0]] * 4, act_types=["move", "move", "idle", "idle"])
    caption, _ = C.assemble_video_caption(
        "ground", "a meadow", kfs, is_multi=False, rng=rng,
        use_descriptor_prob=0.0, is_track_single=True,
    )
    then_markers = [t.split("{sentence_1}")[1].split("{sentence_2}")[0] for t in C.THEN_TEMPLATE]
    assert any(m in caption for m in then_markers), caption
    # no action change -> no THEN narration
    caption2, _ = C.assemble_video_caption(
        "ground", "a meadow", _keyframes([[0]] * 4), is_multi=False,
        rng=random.Random(2), use_descriptor_prob=0.0, is_track_single=True,
    )
    assert not any(m in caption2 for m in then_markers), caption2


def test_caption_diversity_from_one_sequence():
    # VERDICT r1 done-criterion: n distinct captions out of one sequence
    kfs = _keyframes([[0, 1], [0], [0, 2], [2]])
    caps = set()
    for s in range(200):
        cap, _ = C.assemble_video_caption(
            "ground", "a meadow", kfs, is_multi=True, rng=random.Random(s),
            is_track_single=False,
        )
        caps.add(cap)
    assert len(caps) >= 150, len(caps)


def test_descriptor_wrap_rate_and_background_caption():
    hits = bg_hits = 0
    n = 400
    for s in range(n):
        rng = random.Random(s)
        cap, bg = C.assemble_video_caption(
            "ground", "a meadow", _keyframes([[0]]), is_multi=False, rng=rng,
            is_track_single=True,
        )
        plain_markers = ("render", "synthetic", "Game Engine", "virtual")
        hits += any(m in cap for m in plain_markers)
        bg_hits += any(m in bg for m in plain_markers)
        assert "a meadow" in bg
    assert 0.8 < hits / n < 0.97  # 90% wrap (dataset.py:5134-5143)
    assert 0.8 < bg_hits / n < 0.97  # background caption wrapped too (5146-5151)


def test_scene_description_cam_sentences():
    # use_cam_sentence=True must sometimes embed view-point words
    seen_view = False
    for s in range(50):
        d = C.assemble_scene_description(
            "ground", "a meadow", ["toy robot"], [""], ["move"], ["front_left_top"],
            random.Random(s), use_cam_sentence=True,
        )
        if any(w in d for w in ("front", "left", "top")):
            seen_view = True
    assert seen_view
    # the without-cam path never does (reference no_cam_des=True, 1521)
    for s in range(50):
        d = C.assemble_scene_description(
            "ground", "a meadow", ["toy robot"], [""], ["move"], ["front_left_top"],
            random.Random(s), use_cam_sentence=False,
        )
        assert "viewed" not in d and "angle" not in d


def test_validation_vocab_scale():
    from synfmc_tpu.data.dataset import UnrealTrajVideoDataset as DS

    assert set(DS.SCENE_TYPE_DES_MAP) == {"sky", "ground", "near_ground", "overwater", "underwater"}
    assert len(DS.SCENE_TYPE_DES_MAP["ground"]) >= 20   # ref 1598-1621
    assert len(DS.SCENE_TYPE_DES_MAP["sky"]) >= 12      # ref 1581-1596
    ground = DS.SCENE_TYPE_OBJ_DES_MAP["ground"]
    assert len(ground["idle"]) >= 80                     # ref ~130 nouns
    assert len(ground["idle;move;jump"]) >= 80
    assert len(ground["idle;move"]) >= 15
    total = sum(
        len(v) for scene in DS.SCENE_TYPE_OBJ_DES_MAP.values() for v in scene.values()
    )
    assert total >= 250, total


def test_validation_prompts_with_and_without_cam():
    from synfmc_tpu.data.dataset import UnrealTrajVideoDataset as DS

    with_cam = DS.create_validation_prompts(num=40, seed=3)
    without = DS.create_validation_prompts_without_cam(num=40, seed=3)
    assert len(set(with_cam)) > 30 and len(set(without)) > 30
    joined = " ".join(with_cam)
    assert any(w in joined for w in ("front", "back", "left", "right", "top"))
