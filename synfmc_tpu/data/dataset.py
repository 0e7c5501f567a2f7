"""SynFMC dataset: Unreal-rendered clips with 6D camera + object pose labels.

Behavioral parity with the reference datasets (fmc/data/dataset.py:979
``UnrealTrajLoraDataset``, :2215 ``UnrealTrajVideoDataset``): same on-disk
layout, CSV/JSON metadata parsing, clip/fps/stride sampling, visibility
filtering, caption synthesis hooks, sphere masks, relative-pose construction
(including the first-frame rotation-only rewrite), and rejection resampling on
empty captions.

TPU-native departures:
- pure numpy host pipeline (no torch / torchvision / cv2),
- ragged per-frame object lists are padded to ``max_objects`` with validity
  carried by all-zero masks — the jit-able layout the train steps consume
  (SURVEY.md §7 "ragged object data"),
- explicit ``random.Random(seed)`` instead of global RNG state.

On-disk layout (per reference __init__, dataset.py:4629-4760):
  data_root/Rendered_Traj_Results[_multi]/{static,dynamic}/{i}/{seq}_{frame:04d}.png
  lable_root/Rendered_Traj_Results[_multi]/{static,dynamic}/{i}.json
  mask_root/Rendered_Traj_Results[_multi]/{static,dynamic}/{i}/{frame}/total.png + {k}.png
  seq_csv_root/traj_{static,dynamic}[_multi].csv
  hdri_json_file_path, asset_json_file_path
"""

from __future__ import annotations

import csv
import json
import math
import os
import random
from typing import Optional

import numpy as np
from PIL import Image

from synfmc_tpu.data.captions import (
    action_phrase,
    assemble_caption,
    camera_pose_descriptions,
    csv_param_to_dict,
    get_background_description,
    get_seen_objects,
    object_sentence,
)
from synfmc_tpu.data.masks import sphere_gaussian_mask
from synfmc_tpu.geometry import euler_to_matrix_v2
from synfmc_tpu.geometry.relative import relative_cams_to_first, relative_obj_to_cam


class UnrealTrajVideoDataset:
    def __init__(
        self,
        data_root: str,
        lable_root: str,
        mask_root: str,
        seq_csv_root: str,
        hdri_json_file_path: str,
        asset_json_file_path: str,
        sample_n_frames: int = 16,
        ori_fps: int = 16,
        time_duration: int = 4,
        tgt_fps_list=(16, 15, 14, 13, 12, 11, 10, 9, 8, 7, 6, 5, 4),
        allow_change_tgt: bool = False,
        single_static_num: int = 0,
        single_dynamic_num: int = 0,
        multi_static_num: int = 0,
        multi_dynamic_num: int = 0,
        sample_size=(256, 384),
        is_image: bool = False,
        use_flip: bool = False,
        cam_translation_rescale_factor: float = 1.0,
        obj_translation_rescale_factor: float = 1.0,
        use_sphere_mask: bool = False,
        max_objects: int = 6,
        appearance_percentage: float = 0.0015,
        seed: int = 0,
        **_unused,
    ):
        self.data_root = data_root
        self.lable_root = lable_root
        self.mask_root = mask_root
        self.seq_csv_root = seq_csv_root
        self.sample_n_frames = sample_n_frames
        self.ori_fps = ori_fps
        self.time_duration = time_duration
        self.tgt_fps_list = list(tgt_fps_list)
        self.allow_change_tgt = allow_change_tgt
        self.sample_size = tuple(sample_size) if not isinstance(sample_size, int) else (sample_size, sample_size)
        self.is_image = is_image
        self.use_flip = use_flip
        self.cam_translation_rescale_factor = cam_translation_rescale_factor
        self.obj_translation_rescale_factor = obj_translation_rescale_factor
        self.use_sphere_mask = use_sphere_mask
        self.max_objects = max_objects
        self.appearance_percentage = appearance_percentage
        self.rng = random.Random(seed)

        with open(hdri_json_file_path) as f:
            self.hdri_json_data = json.load(f)
        with open(asset_json_file_path) as f:
            self.asset_json_data = json.load(f)

        # dataset index over the 4 category dirs (dataset.py:4700-4735)
        self.dataset, self.data_type_list, self.seq_id_list = [], [], []
        counts = {
            ("single", "static"): single_static_num,
            ("single", "dynamic"): single_dynamic_num,
            ("multi", "static"): multi_static_num,
            ("multi", "dynamic"): multi_dynamic_num,
        }
        for (single_type, static_type), num in counts.items():
            suffix = "_multi" if single_type == "multi" else ""
            for i in range(num):
                self.dataset.append(
                    {
                        "annotation_file_path": os.path.join(
                            lable_root, f"Rendered_Traj_Results{suffix}", static_type, f"{i}.json"
                        ),
                        "clip_path": os.path.join(
                            data_root, f"Rendered_Traj_Results{suffix}", static_type, str(i)
                        ),
                    }
                )
                self.data_type_list.append(f"{single_type}_{static_type}")
                self.seq_id_list.append(str(i))
        self.length = len(self.dataset)
        self.seq_meta_data_map = self._get_csv_meta_data_map()

    # ---- metadata ----

    def _get_csv_meta_data_map(self) -> dict:
        """CSV trajectory metadata: Group row = camera, following rows =
        objects (dataset.py:4760-4800)."""
        out = {}
        for static_type in ("static", "dynamic"):
            for suffix, single_type in (("", "single"), ("_multi", "multi")):
                csv_path = os.path.join(self.seq_csv_root, f"traj_{static_type}{suffix}.csv")
                seq_meta: dict = {}
                if os.path.exists(csv_path):
                    with open(csv_path, encoding="utf-8") as f:
                        rows = list(csv.DictReader(f))
                    seq_id, body_id = None, -1
                    for row in rows:
                        if row["Type"] == "Group":
                            seq_id = row.pop("Seq_ID")
                            body_id = -1
                            seq_meta[seq_id] = {"camera": row, "objects": {}}
                        else:
                            body_id += 1
                            row.pop("Seq_ID")
                            seq_meta[seq_id]["objects"][str(body_id)] = row
                out[f"{single_type}_{static_type}"] = seq_meta
        return out

    # ---- clip sampling (dataset.py:5166-5303) ----

    def get_clip_time_list(self, idx: int) -> list:
        """Merge camera Time_Range_List segments by target object."""
        meta = self.seq_meta_data_map[self.data_type_list[idx]][self.seq_id_list[idx]]
        comment = csv_param_to_dict(meta["camera"]["Comment"])
        tgt_obj_ids = eval(comment["tgt_obj_id_list"])  # noqa: S307 — trusted metadata
        ranges = eval(meta["camera"]["Time_Range_List"])  # noqa: S307
        clips, prev = [], None
        for time_range, tgt in zip(ranges, tgt_obj_ids):
            if prev is None or tgt != prev:
                clips.append(list(time_range))
            else:
                assert clips[-1][-1] == time_range[0]
                clips[-1][-1] = time_range[-1]
            prev = tgt
        return clips

    def sample_clip_from_image_folder(self, folder: str, clip_time_list: list,
                                      start_frame: Optional[int] = None):
        """Segment choice + tgt_fps + stride + PNG reads (dataset.py:5166-5238)."""
        n = self.sample_n_frames
        candidates, fps_mins = [], []
        for start, end in clip_time_list:
            length = end - start
            if length < n:
                continue
            max_interval = math.floor((length - 1) / (n - 1))
            assert max_interval > 0
            candidates.append((start, end))
            fps_mins.append(math.ceil(self.ori_fps / max_interval))
        if not candidates:
            return None, None, None, False
        k = self.rng.randint(0, len(candidates) - 1)
        start, end = candidates[k]
        length = end - start
        tgt_fps = self.rng.randint(fps_mins[k], self.ori_fps)
        interval = round(self.ori_fps / tgt_fps)
        if length - (n - 1) * interval - 1 < 0:
            interval = math.floor(self.ori_fps / tgt_fps)

        files = sorted(
            os.path.join(folder, f) for f in os.listdir(folder)
            if os.path.isfile(os.path.join(folder, f))
        )[:-1]  # the last frame has no forward annotation (dataset.py:5208)
        in_range = []
        for path in files:
            frame_num = int(os.path.basename(path).split("_")[1].split(".")[0])
            if start <= frame_num < end:
                in_range.append(path)
        in_range = sorted(in_range)
        assert len(in_range) == length, (len(in_range), length)
        if start_frame is None:
            max_start = length - (n - 1) * interval - 1
            start_frame = self.rng.randint(0, max_start)
        picks = [in_range[start_frame + i * interval] for i in range(n)]
        frame_indices = [int(os.path.basename(p).split("_")[1].split(".")[0]) for p in picks]
        return tgt_fps, picks, frame_indices, True

    # ---- per-frame labels ----

    @classmethod
    def get_camera_info_np(cls, label_data: dict, frame_idx_list) -> tuple[np.ndarray, np.ndarray]:
        """Annotation JSON -> (F, 4, 4) cameras + (F, 4) intrinsics.

        Quirks preserved (dataset.py:5427-5457): euler passed as
        (entry[5], entry[4], entry[3]); intrinsics row = entry[-3:-1] + [0, 0]
        i.e. fx = sensor_w, fy = sensor_h, cx = cy = 0.
        """
        with open(label_data["annotation_file_path"]) as f:
            annotation = json.load(f)
        cams, intrinsics = [], []
        for t in frame_idx_list:
            entry = annotation["camera"][t]
            xyz, euler = entry[:3], entry[3:6]
            rot = euler_to_matrix_v2(euler[2], euler[1], euler[0])
            m = np.eye(4)
            m[:3, :3] = rot
            m[:3, 3] = xyz
            cams.append(m)
            intrinsics.append(list(entry[-3:-1]) + [0, 0])
        return np.stack(cams), np.asarray(intrinsics, dtype=np.float32)

    def get_text_prompt_and_mask_list(self, idx: int, frame_idx_list):
        """Per-frame visibility + caption assembly (dataset.py:4815-5155).

        Returns (caption, background, per_frame) where per_frame is a list of
        dicts {seen_idxs, total_mask, obj_masks, obj_infos (n,4,4)}.
        """
        data_type = self.data_type_list[idx]
        seq_id = self.seq_id_list[idx]
        meta = self.seq_meta_data_map[data_type][seq_id]
        static_type = "static" if "static" in data_type else "dynamic"
        suffix = "_multi" if "multi" in data_type else ""

        background = get_background_description(self.hdri_json_data, meta["camera"], self.rng)

        with open(self.dataset[idx]["annotation_file_path"]) as f:
            annotation = json.load(f)
        scene_type = csv_param_to_dict(meta["camera"]["Comment"])["scene_type"]

        per_frame = []
        for t in frame_idx_list:
            mask_root = os.path.join(
                self.mask_root, f"Rendered_Traj_Results{suffix}", static_type, seq_id, str(t)
            )
            seen_ids, seen_idxs, total_mask, obj_masks, obj_descs, act_descs, act_types = get_seen_objects(
                mask_root, self.asset_json_data, meta, t,
                appearance_percentage=self.appearance_percentage, max_num=self.max_objects,
            )
            obj_infos = []
            for obj_idx in seen_idxs:
                entry = annotation["objects"][str(obj_idx)][t]
                xyz, euler = entry[-3:], entry[3:6]
                m = np.eye(4)
                m[:3, :3] = euler_to_matrix_v2(euler[2], euler[1], euler[0])
                m[:3, 3] = xyz
                obj_infos.append(m)
            per_frame.append(
                dict(
                    seen_idxs=seen_idxs,
                    total_mask=total_mask,
                    obj_masks=obj_masks,
                    obj_infos=np.stack(obj_infos) if obj_infos else np.zeros((0, 4, 4)),
                    obj_descs=obj_descs,
                    act_descs=act_descs,
                    act_types=act_types,
                )
            )

        if any(len(fr["seen_idxs"]) == 0 for fr in per_frame):
            return "", background, per_frame  # rejection-sampled by __getitem__

        # key frames for the temporal caption (dataset.py:4901)
        f_total = len(frame_idx_list)
        chosen = [i for i in range(0, f_total, max(f_total // 3, 1))][:4]
        sentences_per_key, idxs_per_key = [], []
        for ci in chosen:
            fr = per_frame[ci]
            cam_types = camera_pose_descriptions(annotation, fr["seen_idxs"], frame_idx_list[ci])
            sentences = []
            for desc, act_desc, act_type, cam_type in zip(
                fr["obj_descs"], fr["act_descs"], fr["act_types"], cam_types
            ):
                action = action_phrase(scene_type, act_type, act_desc, self.rng)
                plain, with_cam = object_sentence(desc, action, cam_type, self.rng)
                sentences.append(plain if self.rng.random() < 0.5 else with_cam)
            sentences_per_key.append(sentences)
            idxs_per_key.append(fr["seen_idxs"])
        caption = assemble_caption(
            background, sentences_per_key, idxs_per_key, self.rng, is_video=not self.is_image
        )
        return caption, background, per_frame

    # ---- assembly ----

    def _load_and_resize(self, path: str) -> np.ndarray:
        img = Image.open(path)
        if img.mode != "RGB":
            img = img.convert("RGB")
        h, w = self.sample_size
        img = img.resize((w, h), Image.BILINEAR)
        return np.asarray(img, dtype=np.float32) / 255.0

    def _resize_mask(self, mask: np.ndarray) -> np.ndarray:
        from synfmc_tpu.data.masks import resize_mask_nearest

        h, w = self.sample_size
        m2d = mask[..., 0] if mask.ndim == 3 else mask
        return resize_mask_nearest(m2d.astype(np.float32), h, w)

    def sample_video_from_image_folder(self, folder: str, tgt_fps: int,
                                       start_frame: Optional[int] = None):
        """Fixed-fps whole-video sampling (dataset.py:5240-5276) — the
        allow_change_tgt=True path."""
        n = self.sample_n_frames
        interval = round(self.ori_fps / tgt_fps)
        length = self.ori_fps * self.time_duration
        files = sorted(
            os.path.join(folder, f) for f in os.listdir(folder)
            if os.path.isfile(os.path.join(folder, f))
        )[:-1]
        in_range = [
            p for p in files
            if 0 <= int(os.path.basename(p).split("_")[1].split(".")[0]) < length
        ]
        assert len(in_range) == length, (len(in_range), length)
        if start_frame is None:
            start_frame = self.rng.randint(0, length - (n - 1) * interval - 1)
        picks = [in_range[start_frame + i * interval] for i in range(n)]
        frame_indices = [int(os.path.basename(p).split("_")[1].split(".")[0]) for p in picks]
        return picks, frame_indices

    def get_batch(self, idx: int) -> Optional[dict]:
        video_path = self.dataset[idx]["clip_path"]
        if self.allow_change_tgt:
            tgt_fps = self.rng.choice(self.tgt_fps_list)
            img_paths, frame_list = self.sample_video_from_image_folder(video_path, tgt_fps)
        else:
            clip_times = self.get_clip_time_list(idx)
            tgt_fps, img_paths, frame_list, found = self.sample_clip_from_image_folder(
                video_path, clip_times
            )
            if not found:
                return None

        camera_info, intrinsics = self.get_camera_info_np(self.dataset[idx], frame_list)
        caption, background, per_frame = self.get_text_prompt_and_mask_list(idx, frame_list)
        if caption == "":
            return None

        pixels = np.stack([self._load_and_resize(p) for p in img_paths])  # (F,H,W,3) [0,1]
        pixels = (pixels - 0.5) / 0.5  # Normalize(0.5, 0.5)

        f = len(frame_list)
        h, w = self.sample_size
        o = self.max_objects
        total_mask = np.stack([self._resize_mask(fr["total_mask"]) for fr in per_frame])[..., None]
        obj_masks = np.zeros((f, o, h, w), np.float32)
        obj_info = np.zeros((f, o, 12), np.float32)
        for fi, fr in enumerate(per_frame):
            rel = relative_obj_to_cam(
                camera_info[fi], fr["obj_infos"], self.obj_translation_rescale_factor
            ) if len(fr["obj_infos"]) else np.zeros((0, 12), np.float32)
            for oi, mask in enumerate(fr["obj_masks"][:o]):
                if self.use_sphere_mask:
                    m = sphere_gaussian_mask(mask)
                else:
                    m = mask[..., 0].astype(np.float32)
                obj_masks[fi, oi] = self._resize_mask(m)
                obj_info[fi, oi] = rel[oi]

        flip = self.use_flip and self.rng.random() < 0.5
        if flip:  # RandomHorizontalFlipWithPose parity (dataset.py:885-905)
            pixels = pixels[:, :, ::-1].copy()
            total_mask = total_mask[:, :, ::-1].copy()
            obj_masks = obj_masks[:, :, :, ::-1].copy()

        camera_rt = relative_cams_to_first(camera_info, self.cam_translation_rescale_factor)
        # first frame -> absolute rotation, zero translation (dataset.py:5496-5507)
        first = np.zeros((3, 4), np.float32)
        first[:3, :3] = camera_info[0][:3, :3]
        camera_rt[0] = first.reshape(-1)

        return dict(
            video_path=video_path,
            pixel_values=pixels.astype(np.float32),
            caption=caption,
            background_caption=background,
            camera_rt=camera_rt.astype(np.float32),
            intrinsics=intrinsics.astype(np.float32),
            obj_union_mask=total_mask.astype(np.float32),
            obj_info=obj_info,
            obj_masks=obj_masks,
            flip_flag=np.asarray(flip),
            frame_list=frame_list,
            tgt_fps=tgt_fps,
        )

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, idx: int) -> dict:
        # rejection resampling until a caption exists (dataset.py:5464-5471)
        for _ in range(1000):
            sample = self.get_batch(idx)
            if sample is not None:
                return sample
            idx = self.rng.randint(0, self.length - 1)
        raise RuntimeError("could not sample a captioned clip in 1000 tries")

    # ---- validation prompt generators (dataset.py:1781, 3000, 3538, 4073) ----

    SCENE_OBJECTS = {
        "ground": ["a red robot", "a girl", "a knight", "a wolf"],
        "sky": ["a dragon", "a drone", "an eagle"],
        "underwater": ["a shark", "a turtle", "a submarine"],
    }
    SCENE_BACKGROUNDS = {
        "ground": ["a grassy field", "a city street", "a desert"],
        "sky": ["a cloudy sky", "a sunset sky"],
        "underwater": ["a coral reef", "the deep ocean"],
    }

    @classmethod
    def create_validation_prompts(cls, num: int = 4, use_synthetic_des: bool = True,
                                  max_obj_num: int = 3, seed: int = 0) -> list[str]:
        """Template-driven validation prompts without dataset access
        (reference create_validation_prompts family)."""
        from synfmc_tpu.data.captions import (
            ACTION_WORDS,
            DESCRIPTOR_TEMPLATE,
            assemble_caption,
            object_sentence,
        )

        rng = random.Random(seed)
        prompts = []
        for _ in range(num):
            scene = rng.choice(list(cls.SCENE_OBJECTS))
            n_obj = rng.randint(1, max_obj_num)
            sentences = []
            for _ in range(n_obj):
                obj = rng.choice(cls.SCENE_OBJECTS[scene])
                actions = [w for (s, _), ws in ACTION_WORDS.items() if s == scene for w in ws]
                plain, _ = object_sentence(obj, rng.choice(actions), "", rng)
                sentences.append(plain)
            background = rng.choice(cls.SCENE_BACKGROUNDS[scene])
            prompt = assemble_caption(
                background, [sentences], [list(range(n_obj))], rng,
                use_descriptor_prob=0.9 if use_synthetic_des else 0.0,
            )
            prompts.append(prompt)
        return prompts

    @staticmethod
    def collate_fn(samples: list[dict]) -> dict:
        """Dense numpy batch (the reference's ragged lists are already padded
        per-sample; dataset.py:5532-5568)."""
        stack = lambda key: np.stack([s[key] for s in samples])
        return {
            "video_paths": [s["video_path"] for s in samples],
            "pixel_values": stack("pixel_values"),
            "captions": [s["caption"] for s in samples],
            "background_captions": [s["background_caption"] for s in samples],
            "camera_rt": stack("camera_rt"),
            "intrinsics": stack("intrinsics"),
            "obj_union_mask": stack("obj_union_mask"),
            "obj_info": stack("obj_info"),
            "obj_masks": stack("obj_masks"),
            "flip_flag": stack("flip_flag"),
            "frame_lists": [s["frame_list"] for s in samples],
        }


class UnrealTrajLoraDataset(UnrealTrajVideoDataset):
    """Stage-1 image dataset: a random single frame per clip
    (fmc/data/dataset.py:979-2213)."""

    def __init__(self, *args, **kwargs):
        kwargs.setdefault("is_image", True)
        super().__init__(*args, **kwargs)

    def get_batch(self, idx: int) -> Optional[dict]:
        folder = self.dataset[idx]["clip_path"]
        files = sorted(
            os.path.join(folder, f) for f in os.listdir(folder)
            if os.path.isfile(os.path.join(folder, f)) and f.endswith(".png") and "-" not in f
        )[:-1]
        if not files:
            return None
        path = self.rng.choice(files)
        t = int(os.path.basename(path).split("_")[1].split(".")[0])
        caption, background, _ = self.get_text_prompt_and_mask_list(idx, [t])
        if caption == "":
            return None
        return dict(
            video_path=path,
            pixel_values=((self._load_and_resize(path) - 0.5) / 0.5).astype(np.float32),
            caption=caption,
            background_caption=background,
        )

    @staticmethod
    def collate_fn(samples: list[dict]) -> dict:
        return {
            "pixel_values": np.stack([s["pixel_values"] for s in samples]),
            "captions": [s["caption"] for s in samples],
            "background_captions": [s["background_caption"] for s in samples],
        }
