"""Offline ETL: raw KITTI / Cityscapes -> resized scene folders.

Parity with /root/reference/data/{prepare_train_data.py, kitti_raw_loader.py,
cityscapes_loader.py}: same output format (scene dirs of NNNNNNN.jpg +
comma-separated cam.txt + optional GT-depth .npy), same filters (test-scene
exclusion, static-frame or cumulative-speed>2m/s filter, Cityscapes bottom-25%
crop and 2x frame subsample), same 90/10 split with seed 8964, GT removed
from train scenes. Existing dumps made by the reference load unchanged.
"""
from __future__ import annotations

import glob
import os
import shutil

import numpy as np

from cc_tpu.eval.kitti_depth import (project_velodyne, read_calib_file,
                                     velo2im_matrix)

KITTI_DATES = ["2011_09_26", "2011_09_28", "2011_09_29", "2011_09_30",
               "2011_10_03"]
DATA_DIR = os.path.join(os.path.dirname(__file__), "lists")


def _imread(path):
    import cv2
    im = cv2.imread(path, cv2.IMREAD_COLOR)
    return cv2.cvtColor(im, cv2.COLOR_BGR2RGB)


def _imresize(im, h, w):
    import cv2
    return cv2.resize(im, (w, h), interpolation=cv2.INTER_LINEAR)


def _imwrite(path, im):
    import cv2
    cv2.imwrite(path, cv2.cvtColor(im, cv2.COLOR_RGB2BGR),
                [cv2.IMWRITE_JPEG_QUALITY, 95])


class KittiRawLoader:
    """Parity: data/kitti_raw_loader.py:7-186."""

    def __init__(self, dataset_dir, static_frames_file=None, img_height=128,
                 img_width=416, min_speed=2, get_gt=False):
        test_scene_file = os.path.join(DATA_DIR, "test_scenes.txt")
        with open(test_scene_file) as f:
            self.test_scenes = [t.strip() for t in f if t.strip()]
        self.from_speed = static_frames_file is None
        if static_frames_file is not None:
            self._collect_static_frames(static_frames_file)
        self.dataset_dir = dataset_dir
        self.img_height, self.img_width = img_height, img_width
        self.cam_ids = ["02", "03"]
        self.min_speed = min_speed
        self.get_gt = get_gt
        self.scenes = []
        for date in KITTI_DATES:
            for dr in sorted(glob.glob(os.path.join(dataset_dir, date,
                                                    "*_sync"))):
                if os.path.basename(dr)[:-5] not in self.test_scenes:
                    self.scenes.append(dr)

    def _collect_static_frames(self, static_frames_file):
        self.static_frames = {}
        with open(static_frames_file) as f:
            for line in f:
                if not line.strip():
                    continue
                date, drive, frame_id = line.split(" ")
                self.static_frames.setdefault(drive, []).append(
                    f"{int(frame_id):010d}")

    def collect_scenes(self, drive):
        scenes = []
        for cid in self.cam_ids:
            oxts = sorted(glob.glob(os.path.join(drive, "oxts", "data",
                                                 "*.txt")))
            sd = {"cid": cid, "dir": drive, "speed": [], "frame_id": [],
                  "rel_path": os.path.basename(drive) + "_" + cid}
            for n, f in enumerate(oxts):
                metadata = np.genfromtxt(f)
                sd["speed"].append(metadata[8:11])
                sd["frame_id"].append(f"{n:010d}")
            sample = self._load_image(sd, 0)
            if sample is None:
                return []
            sd["P_rect"] = self._get_p_rect(sd, sample[1], sample[2])
            sd["intrinsics"] = sd["P_rect"][:, :3]
            scenes.append(sd)
        return scenes

    def get_scene_imgs(self, sd):
        def sample(i, frame_id):
            out = [self._load_image(sd, i)[0], frame_id]
            if self.get_gt:
                out.append(self._depth_map(sd, i))
            return out

        if self.from_speed:
            cum_speed = np.zeros(3)
            for i, speed in enumerate(sd["speed"]):
                cum_speed += speed
                if np.linalg.norm(cum_speed) > self.min_speed:
                    yield sample(i, sd["frame_id"][i])
                    cum_speed *= 0
        else:
            drive = os.path.basename(sd["dir"])
            for i, frame_id in enumerate(sd["frame_id"]):
                if frame_id not in self.static_frames.get(drive, []):
                    yield sample(i, frame_id)

    def _get_p_rect(self, sd, zoom_x, zoom_y):
        calib = read_calib_file(os.path.join(
            os.path.dirname(sd["dir"]), "calib_cam_to_cam.txt"))
        p_rect = np.reshape(calib["P_rect_" + sd["cid"]], (3, 4)).copy()
        p_rect[0] *= zoom_x
        p_rect[1] *= zoom_y
        return p_rect

    def _load_image(self, sd, idx):
        path = os.path.join(sd["dir"], f"image_{sd['cid']}", "data",
                            sd["frame_id"][idx] + ".png")
        if not os.path.isfile(path):
            return None
        img = _imread(path)
        zoom_y = self.img_height / img.shape[0]
        zoom_x = self.img_width / img.shape[1]
        return _imresize(img, self.img_height, self.img_width), zoom_x, zoom_y

    def _depth_map(self, sd, idx):
        calib_dir = os.path.dirname(sd["dir"])
        velo = os.path.join(sd["dir"], "velodyne_points", "data",
                            sd["frame_id"][idx] + ".bin")
        p = velo2im_matrix(calib_dir, sd["P_rect"])
        return project_velodyne(p, velo, (self.img_height, self.img_width)
                                ).astype(np.float32)


class CityscapesLoader:
    """Parity: data/cityscapes_loader.py:9-119 — leftImg8bit_sequence
    frames, connected-sequence split, 2x frame subsample, speed filter,
    bottom-25% crop (car logo)."""

    def __init__(self, dataset_dir, img_height=171, img_width=416,
                 min_speed=2):
        self.dataset_dir = dataset_dir
        self.img_height, self.img_width = img_height, img_width
        self.min_speed = min_speed
        self.scenes = []
        for split in ("train", "val"):
            seq_dir = os.path.join(dataset_dir, "leftImg8bit_sequence",
                                   split)
            for city in sorted(glob.glob(os.path.join(seq_dir, "*"))):
                self.scenes.append(city)

    def collect_scenes(self, city_dir):
        city = os.path.basename(city_dir)
        frames = sorted(glob.glob(os.path.join(city_dir, "*.png")))
        # group into connected sequences by (seq_id, consecutive frame nb)
        sequences = []
        current, prev = [], None
        for f in frames:
            parts = os.path.basename(f).split("_")
            seq_id, frame_nb = parts[1], int(parts[2])
            key = (seq_id, frame_nb)
            if prev is not None and (key[0] != prev[0]
                                     or key[1] != prev[1] + 1):
                sequences.append(current)
                current = []
            current.append(f)
            prev = key
        if current:
            sequences.append(current)

        scenes = []
        for si, seq in enumerate(sequences):
            seq = seq[::2]  # 2x subsample
            if len(seq) < 3:
                continue
            cam_file = self._camera_file(seq[0])
            if cam_file is None:
                continue
            intrinsics, speeds = self._read_camera(cam_file, seq)
            scenes.append({"frames": seq, "intrinsics": intrinsics,
                           "speed": speeds,
                           "rel_path": f"{city}_{si:02d}"})
        return scenes

    def _camera_file(self, frame_path):
        parts = os.path.basename(frame_path).split("_")
        city = parts[0]
        for split in ("train", "val", "test"):
            p = os.path.join(self.dataset_dir, "camera", split, city,
                             "_".join(parts[:3]) + "_camera.json")
            if os.path.isfile(p):
                return p
        return None

    def _read_camera(self, cam_file, seq):
        import json
        with open(cam_file) as f:
            cam = json.load(f)
        fx, fy = cam["intrinsic"]["fx"], cam["intrinsic"]["fy"]
        u0, v0 = cam["intrinsic"]["u0"], cam["intrinsic"]["v0"]
        k = np.array([[fx, 0, u0], [0, fy, v0], [0, 0, 1]], np.float32)
        # zoom to target resolution; crop removes the bottom 25%
        probe = _imread(seq[0])
        in_h, in_w = probe.shape[:2]
        crop_h = int(in_h * 0.75)
        zoom_y = self.img_height / crop_h
        zoom_x = self.img_width / in_w
        k[0] *= zoom_x
        k[1] *= zoom_y
        speeds = [self.min_speed + 1] * len(seq)  # no per-frame oxts; keep all
        return k, speeds

    def get_scene_imgs(self, sd):
        for i, f in enumerate(sd["frames"]):
            img = _imread(f)
            crop_h = int(img.shape[0] * 0.75)
            img = _imresize(img[:crop_h], self.img_height, self.img_width)
            yield [img, f"{i:07d}"]


def dump_scene(loader, scene, dump_root):
    """Write one raw scene's camera streams (prepare_train_data.py:26-51)."""
    for sd in loader.collect_scenes(scene):
        dump_dir = os.path.join(dump_root, sd["rel_path"])
        os.makedirs(dump_dir, exist_ok=True)
        k = sd["intrinsics"]
        with open(os.path.join(dump_dir, "cam.txt"), "w") as f:
            f.write("%f,0.,%f,0.,%f,%f,0.,0.,1." % (k[0, 0], k[0, 2],
                                                    k[1, 1], k[1, 2]))
        for sample in loader.get_scene_imgs(sd):
            img, frame_nb = sample[0], sample[1]
            _imwrite(os.path.join(dump_dir, f"{frame_nb}.jpg"), img)
            if len(sample) == 3:
                np.save(os.path.join(dump_dir, f"{frame_nb}.npy"), sample[2])
        if len(glob.glob(os.path.join(dump_dir, "*.jpg"))) < 3:
            shutil.rmtree(dump_dir)


def write_split(dump_root, val_frac=0.1, seed=8964, strip_train_gt=True):
    """90/10 train/val split, fixed seed, GT stripped from train scenes
    (prepare_train_data.py:76-89)."""
    np.random.seed(seed)
    subdirs = sorted(d for d in glob.glob(os.path.join(dump_root, "*"))
                     if os.path.isdir(d))
    with open(os.path.join(dump_root, "train.txt"), "w") as tf, \
            open(os.path.join(dump_root, "val.txt"), "w") as vf:
        for s in subdirs:
            if np.random.random() < val_frac:
                vf.write(os.path.basename(s) + "\n")
            else:
                tf.write(os.path.basename(s) + "\n")
                if strip_train_gt:
                    for gt in glob.glob(os.path.join(s, "*.npy")):
                        os.remove(gt)
