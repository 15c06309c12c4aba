"""Offline raw-dataset preparers (host-side, multiprocess).

Capability parity with the reference preparers, preserving the prepared-dir
layout exactly (stacked-frame PNGs + per-folder ``train.txt`` + global
``train.txt`` + copied calib files) so directories are interchangeable:

* KITTI_RAW  — 3-frame vertical stacks, skipping Eigen static frames and test
  scenes (/root/reference/core/dataset/kitti_raw.py:8-137).
* KITTI_Odo  — 2-frame stacks for odometry sequences 00-08 with ``calib.txt``
  (kitti_odo.py:7-74).
* SINTEL_RAW — 3-frame stacks from sorted scene filenames, configurable stride,
  no calib (sintel_raw.py:8-99).
* NYU_Prepare — 2-frame stacks of .ppm scene dirs filtered to the official
  train split, hardcoded intrinsics line (nyu_v2.py:14-161).

The worker fan-out uses a ``multiprocessing.Pool`` over folders instead of
the reference's shared mp.Queue with its benign empty()/get() race
(SURVEY.md §5) — same partitioning semantics, no race.
"""

from __future__ import annotations

import functools
import multiprocessing
import os
import shutil

import numpy as np

_NYU_INTRINSICS_LINE = (
    "P_rect: 5.1885790117450188e+02 0.0 3.2558244941119034e+02 0.0 "
    "0.0 5.1946961112127485e+02 2.5373616633400465e+02 0.0 0.0 0.0 1.0 0.0"
)


def _imread(path):
    import cv2

    return cv2.imread(path)


def _imwrite(path, img):
    import cv2

    cv2.imwrite(path, img.astype("uint8"))


def _concat_manifests(output_dir: str, folder_manifests: list[str]):
    with open(os.path.join(output_dir, "train.txt"), "w") as f:
        for m in folder_manifests:
            if os.path.isfile(m):
                with open(m) as g:
                    f.write(g.read())


# ---------------------------------------------------------------------------
# KITTI raw
# ---------------------------------------------------------------------------


def _kitti_raw_worker(args, data_dir, output_dir, stride, static_frames, test_scenes):
    folder = args  # 'date/drive'
    scene = folder.split("/")[1]
    if scene[:-5] in test_scenes:
        return None
    static_ids = set(static_frames.get(folder, []))
    image_path = os.path.join(data_dir, folder, "image_02/data")
    dump = os.path.join(output_dir, folder)
    names = sorted(os.listdir(image_path))
    date = folder.split("/")[0]
    os.makedirs(dump, exist_ok=True)
    lines = []
    n_span = 2 * stride
    for n in range(len(names) - n_span):
        ids = [f"{n:010d}", f"{n + stride:010d}", f"{n + 2 * stride:010d}"]
        if any(i in static_ids for i in ids):
            continue
        frames = [_imread(os.path.join(image_path, i + ".png")) for i in ids]
        if any(f is None for f in frames):
            continue
        _imwrite(os.path.join(dump, ids[0] + ".png"), np.concatenate(frames, 0))
        lines.append(
            f"{os.path.join(folder, ids[0] + '.png')} "
            f"{os.path.join(date, 'calib_cam_to_cam.txt')}\n"
        )
    with open(os.path.join(dump, "train.txt"), "w") as f:
        f.writelines(lines)
    return folder


class KITTI_RAW:
    """KITTI-raw 3-frame snippet preparer (kitti_raw.py:64-137)."""

    def __init__(self, data_dir, static_frames_txt, test_scenes_txt):
        self.data_dir = data_dir
        self.static_frames_txt = static_frames_txt
        self.test_scenes_txt = test_scenes_txt

    def collect_static_frame(self) -> dict:
        static = {}
        with open(self.static_frames_txt) as f:
            for line in f:
                date, drive, frame_id = line.strip().split(" ")
                static.setdefault(os.path.join(date, drive), []).append(
                    f"{int(frame_id):010d}"
                )
        return static

    def collect_test_scenes(self) -> list:
        with open(self.test_scenes_txt) as f:
            return [line.strip() for line in f]

    def prepare_data_mp(self, output_dir, stride=1, num_processes=16):
        if not os.path.isfile(os.path.join(output_dir, "train.txt")):
            os.makedirs(output_dir, exist_ok=True)
            static = self.collect_static_frame()
            tests = self.collect_test_scenes()
            folders = []
            for d in sorted(os.listdir(self.data_dir)):
                for s in sorted(os.listdir(os.path.join(self.data_dir, d))):
                    if os.path.isdir(os.path.join(self.data_dir, d, s)):
                        folders.append(os.path.join(d, s))
            worker = functools.partial(
                _kitti_raw_worker,
                data_dir=self.data_dir,
                output_dir=output_dir,
                stride=stride,
                static_frames=static,
                test_scenes=tests,
            )
            with multiprocessing.Pool(num_processes) as pool:
                pool.map(worker, folders)

        # calib files first: the global train.txt is the completion sentinel
        # multi-host waiters poll (train.py), so it must be written LAST
        for date in sorted(os.listdir(self.data_dir)):
            src = os.path.join(self.data_dir, date, "calib_cam_to_cam.txt")
            dst_dir = os.path.join(output_dir, date)
            if os.path.isfile(src) and os.path.isdir(dst_dir):
                shutil.copy(src, os.path.join(dst_dir, "calib_cam_to_cam.txt"))

        manifests = []
        for date in sorted(os.listdir(output_dir)):
            date_dir = os.path.join(output_dir, date)
            if os.path.isdir(date_dir):
                for d in sorted(os.listdir(date_dir)):
                    manifests.append(os.path.join(date_dir, d, "train.txt"))
        _concat_manifests(output_dir, manifests)
        print("Data Preparation Finished.")


# ---------------------------------------------------------------------------
# KITTI odometry
# ---------------------------------------------------------------------------


def _kitti_odo_worker(folder, data_dir, output_dir, stride):
    image_path = os.path.join(data_dir, folder, "image_2")
    dump = os.path.join(output_dir, folder)
    os.makedirs(dump, exist_ok=True)
    names = sorted(os.listdir(image_path))
    lines = []
    for n in range(len(names) - stride):
        ids = [f"{n:06d}", f"{n + stride:06d}"]
        frames = [_imread(os.path.join(image_path, i + ".png")) for i in ids]
        if any(f is None for f in frames):
            continue
        _imwrite(os.path.join(dump, ids[0] + ".png"), np.concatenate(frames, 0))
        lines.append(
            f"{os.path.join(folder, ids[0] + '.png')} "
            f"{os.path.join(folder, 'calib.txt')}\n"
        )
    with open(os.path.join(dump, "train.txt"), "w") as f:
        f.writelines(lines)


class KITTI_Odo:
    """KITTI odometry 2-frame preparer, sequences 00-08 (kitti_odo.py:33-74)."""

    TRAIN_SEQS = ("00", "01", "02", "03", "04", "05", "06", "07", "08")

    def __init__(self, data_dir):
        self.data_dir = data_dir

    def prepare_data_mp(self, output_dir, stride=1, num_processes=16):
        if not os.path.isfile(os.path.join(output_dir, "train.txt")):
            os.makedirs(output_dir, exist_ok=True)
            folders = [d for d in sorted(os.listdir(self.data_dir)) if d in self.TRAIN_SEQS]
            worker = functools.partial(
                _kitti_odo_worker,
                data_dir=self.data_dir,
                output_dir=output_dir,
                stride=stride,
            )
            with multiprocessing.Pool(num_processes) as pool:
                pool.map(worker, folders)

        # calib first; the global train.txt is the completion sentinel
        for d in self.TRAIN_SEQS:
            src = os.path.join(self.data_dir, d, "calib.txt")
            if os.path.isfile(src):
                shutil.copy(src, os.path.join(output_dir, d, "calib.txt"))
        _concat_manifests(
            output_dir,
            [os.path.join(output_dir, d, "train.txt") for d in self.TRAIN_SEQS],
        )
        print("Data Preparation Finished.")


# ---------------------------------------------------------------------------
# Sintel
# ---------------------------------------------------------------------------


def _sintel_worker(folder, data_dir, output_dir, stride):
    image_path = os.path.join(data_dir, folder)
    dump = os.path.join(output_dir, folder)
    os.makedirs(dump, exist_ok=True)
    names = sorted(os.listdir(image_path))
    lines = []
    for n in range(len(names) - 2 * stride):
        trip = [names[n], names[n + stride], names[n + 2 * stride]]
        frames = [_imread(os.path.join(image_path, t)) for t in trip]
        if any(f is None for f in frames):
            continue
        _imwrite(os.path.join(dump, f"{n:010d}.png"), np.concatenate(frames, 0))
        lines.append(f"{os.path.join(folder, f'{n:010d}.png')}\n")
    with open(os.path.join(dump, "train.txt"), "w") as f:
        f.writelines(lines)


class SINTEL_RAW:
    """Sintel scene-dir 3-frame preparer (sintel_raw.py:57-99)."""

    def __init__(self, data_dir):
        self.data_dir = data_dir

    def prepare_data_mp(self, output_dir, stride=1, num_processes=8):
        if not os.path.isfile(os.path.join(output_dir, "train.txt")):
            os.makedirs(output_dir, exist_ok=True)
            folders = [
                d
                for d in sorted(os.listdir(self.data_dir))
                if os.path.isdir(os.path.join(self.data_dir, d))
            ]
            worker = functools.partial(
                _sintel_worker,
                data_dir=self.data_dir,
                output_dir=output_dir,
                stride=stride,
            )
            with multiprocessing.Pool(num_processes) as pool:
                pool.map(worker, folders)

        manifests = [
            os.path.join(output_dir, d, "train.txt")
            for d in sorted(os.listdir(output_dir))
            if os.path.isdir(os.path.join(output_dir, d))
        ]
        _concat_manifests(output_dir, manifests)
        print("Data Preparation Finished.")


# ---------------------------------------------------------------------------
# NYUv2
# ---------------------------------------------------------------------------


def _nyu_worker(folder, data_dir, output_dir, stride, train_scenes):
    import imageio.v2 as imageio

    scene_name = folder.split("/")[-1]
    parts = scene_name.split("_")
    scene_full = "_".join(parts[:-1]) + "_" + parts[-1][:4]
    if scene_full not in train_scenes:
        return
    image_path = os.path.join(data_dir, folder)
    dump = os.path.join(output_dir, folder)
    os.makedirs(dump, exist_ok=True)
    names = sorted(n for n in os.listdir(image_path) if n.endswith(".ppm"))
    # the last ppm file of a scene is frequently truncated (nyu_v2.py:48)
    names = names[:-1]
    lines = []
    for n in range(len(names) - stride):
        try:
            a = imageio.imread(os.path.join(image_path, names[n]))
            b = imageio.imread(os.path.join(image_path, names[n + stride]))
        except Exception:
            continue
        out = os.path.splitext(names[n])[0] + ".png"
        imageio.imsave(
            os.path.join(dump, out), np.concatenate([a, b], 0).astype("uint8")
        )
        lines.append(f"{os.path.join(folder, out)} calib_cam_to_cam.txt\n")
    with open(os.path.join(dump, "train.txt"), "w") as f:
        f.writelines(lines)


class NYU_Prepare:
    """NYUv2 raw .ppm 2-frame preparer with official train split (nyu_v2.py:68-161)."""

    def __init__(self, data_dir, test_dir):
        self.data_dir = data_dir
        self.test_data = os.path.join(test_dir, "nyu_depth_v2_labeled.mat")
        self.splits = os.path.join(test_dir, "splits.mat")

    def _split_scenes(self, key: str) -> list:
        import h5py
        import scipy.io as sio

        data = h5py.File(self.test_data, "r")
        split = np.array(sio.loadmat(self.splits)[key]).squeeze(1)
        scene_refs = data["scenes"][0][split - 1]
        names = []
        for ref in scene_refs:
            name = "".join(chr(j) for j in data[ref][:])
            if name not in names:
                names.append(name)
        return names

    def get_test_scenes(self):
        return self._split_scenes("testNdxs")

    def get_train_scenes(self):
        return self._split_scenes("trainNdxs")

    def prepare_data_mp(self, output_dir, stride=10, num_processes=32):
        if not os.path.isfile(os.path.join(output_dir, "train.txt")):
            os.makedirs(output_dir, exist_ok=True)
            train_scenes = self.get_train_scenes()
            folders = []
            for d in sorted(os.listdir(self.data_dir)):
                if not os.path.isdir(os.path.join(self.data_dir, d)):
                    continue
                for s in sorted(os.listdir(os.path.join(self.data_dir, d))):
                    if os.path.isdir(os.path.join(self.data_dir, d, s)):
                        folders.append(os.path.join(d, s))
            worker = functools.partial(
                _nyu_worker,
                data_dir=self.data_dir,
                output_dir=output_dir,
                stride=stride,
                train_scenes=train_scenes,
            )
            with multiprocessing.Pool(num_processes) as pool:
                pool.map(worker, folders)

        manifests = []
        for d in sorted(os.listdir(output_dir)):
            dd = os.path.join(output_dir, d)
            if os.path.isdir(dd):
                for s in sorted(os.listdir(dd)):
                    manifests.append(os.path.join(dd, s, "train.txt"))
        # intrinsics first; the global train.txt is the completion sentinel
        with open(os.path.join(output_dir, "calib_cam_to_cam.txt"), "w") as f:
            f.write(_NYU_INTRINSICS_LINE)
        _concat_manifests(output_dir, manifests)
        print("Data Preparation Finished.")
