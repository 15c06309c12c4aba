"""Host-side training/eval datasets over prepared directories (NHWC numpy).

Capability parity with the reference dataset classes
(/root/reference/core/dataset/): manifest-driven stacked-PNG decode,
per-frame resize to ``img_hw``, joint horizontal flip, /255 normalization,
intrinsics reading/rescaling, and — crucially — the reference's *idx-seeded*
resampling (kitti_prepared.py:38-42: ``np.random.seed(idx)`` then a uniform
draw), which makes every sample a pure function of its integer index.  That
determinism is what lets the threaded loader parallelize decoding with
bit-identical results.

Layout difference from the reference: samples are returned channels-LAST
(H*, W, 3) float32 — the TPU-native layout — instead of torch CHW tensors.
"""

from __future__ import annotations

import copy
import os

import numpy as np


def _imread(path):
    import cv2

    img = cv2.imread(path)
    if img is None:
        raise FileNotFoundError(path)
    return img


def _resize(img, wh):
    import cv2

    return cv2.resize(img, wh)


def _maybe_flip(img, rng):
    """Joint horizontal flip of the whole stack with probability 0.5."""
    if rng.rand() > 0.5:
        return img[:, ::-1]
    return img


class StackedFrameDataset:
    """Base: train.txt manifest of vertically stacked ``num_frames`` PNGs.

    ``cache_dir``: optional directory of decoded-and-resized uint8 ``.npy``
    copies, filled lazily on first access.  PNG decode + per-frame resize
    dominates host time on few-core hosts (a v5e step is faster than decoding
    its batch on one core); the cache turns repeat visits — guaranteed by the
    idx-seeded uniform resampling over a finite dataset — into mmap reads.
    Augmentation (flip) stays per-index downstream of the cache.
    """

    num_frames = 3
    has_intrinsics = True

    def __init__(
        self,
        data_dir,
        num_scales=3,
        img_hw=(256, 832),
        num_iterations=None,
        cache_dir=None,
        return_intrinsics=False,
        emit_uint8=False,
    ):
        self.data_dir = data_dir
        self.num_scales = num_scales
        self.img_hw = tuple(img_hw)
        self.num_iterations = num_iterations
        self.cache_dir = cache_dir
        # emit_uint8: __getitem__ returns the decoded+resized (and flipped)
        # stack as uint8, deferring the /255 float cast to the device (the
        # train step casts dtype-gated, train_step.py::_loss_fn).  Bit-for-bit
        # the same values — sources are 8-bit PNGs and cv2.resize preserves
        # uint8 — but the host touches and ships 4x fewer bytes per batch:
        # measured 111.8 -> see benchmarks/LOADER_BENCH_r04.json.
        self.emit_uint8 = emit_uint8
        # flowposenet mode: __getitem__ returns (img, K, K_inv) at network
        # resolution.  Horizontal-flip augmentation is disabled in this mode —
        # a flip mirrors the principal point and negates flow-u, which would
        # silently falsify the epipolar geometry.
        self.return_intrinsics = return_intrinsics
        if return_intrinsics and not self.has_intrinsics:
            raise ValueError(
                f"{type(self).__name__} has no calibration files; flowposenet "
                "needs a dataset with intrinsics"
            )
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)
        self.data_list = self.get_data_list(os.path.join(data_dir, "train.txt"))

    # -- manifest ----------------------------------------------------------
    def get_data_list(self, info_file):
        with open(info_file, "r") as f:
            lines = f.readlines()
        data_list = []
        for line in lines:
            k = line.strip("\n").split()
            data = {"image_file": os.path.join(self.data_dir, k[0])}
            if len(k) > 1:
                data["cam_intrinsic_file"] = os.path.join(self.data_dir, k[1])
            data_list.append(data)
        print(f"A total of {len(data_list)} image pairs found")
        return data_list

    def count(self):
        return len(self.data_list)

    def rand_num(self, idx):
        """Deterministic idx -> sample index (kitti_prepared.py:38-42)."""
        rng = np.random.RandomState(idx)
        return rng.randint(self.count()), rng

    def __len__(self):
        return self.num_iterations if self.num_iterations is not None else self.count()

    # -- preprocessing -----------------------------------------------------
    def resize_img(self, img, img_hw):
        """Split the stack, resize each frame, restack (kitti_prepared.py:63-75)."""
        n = self.num_frames
        h = img.shape[0] // n
        frames = [
            _resize(img[i * h : (i + 1) * h], (img_hw[1], img_hw[0]))
            for i in range(n)
        ]
        return np.concatenate(frames, 0)

    def preprocess_img(self, img, img_hw=None, is_test=False, rng=None):
        img_hw = img_hw or self.img_hw
        img = self.resize_img(img, img_hw)
        if not is_test:
            img = _maybe_flip(img, rng or np.random)
        return np.ascontiguousarray(img, dtype=np.float32) / 255.0

    # -- intrinsics --------------------------------------------------------
    def read_cam_intrinsic(self, fname):
        with open(fname, "r") as f:
            lines = f.readlines()
        data = [float(k) for k in lines[-1].strip("\n").split(" ")[1:]]
        return np.array(data).reshape(3, 4)[:3, :3]

    def rescale_intrinsics(self, K, img_hw_orig, img_hw_new):
        K = K.copy()
        K[0, :] *= img_hw_new[0] / img_hw_orig[0]
        K[1, :] *= img_hw_new[1] / img_hw_orig[1]
        return K

    def get_intrinsics_per_scale(self, K, scale):
        K_new = copy.deepcopy(K)
        K_new[0, :] /= 2**scale
        K_new[1, :] /= 2**scale
        return K_new, np.linalg.inv(K_new)

    def get_multiscale_intrinsics(self, K, num_scales):
        pairs = [self.get_intrinsics_per_scale(K, s) for s in range(num_scales)]
        return (
            np.stack([p[0] for p in pairs], 0),
            np.stack([p[1] for p in pairs], 0),
        )

    # -- items ---------------------------------------------------------------
    def _resized_uint8(self, sample_idx):
        """Decoded + resized (pre-augmentation) uint8 stack, cached if asked."""
        import hashlib
        import threading
        import uuid

        data = self.data_list[sample_idx]
        if self.cache_dir is None:
            return self.resize_img(_imread(data["image_file"]), self.img_hw)
        h, w = self.img_hw
        # key by source path (not index): a regenerated train.txt in the same
        # data_dir must miss instead of silently serving stale frames
        tag = hashlib.sha1(data["image_file"].encode()).hexdigest()[:16]
        cache = os.path.join(self.cache_dir, f"{tag}_{h}x{w}.npy")
        if os.path.exists(cache):
            return np.load(cache, mmap_mode="r")
        img = self.resize_img(_imread(data["image_file"]), self.img_hw)
        # unique tmp per writer: loader threads share a PID and may fill the
        # same entry concurrently
        tmp = f"{cache}.tmp{os.getpid()}.{threading.get_ident()}.{uuid.uuid4().hex[:8]}"
        with open(tmp, "wb") as f:  # np.save(path) would append .npy to tmp
            np.save(f, img.astype(np.uint8))
        os.replace(tmp, cache)  # atomic publish; losers just overwrite equal bytes
        return img

    def _orig_frame_wh(self, image_file):
        """(W, H-per-frame) of the stacked source PNG, from its IHDR header."""
        if not hasattr(self, "_wh_cache"):
            self._wh_cache = {}
        if image_file not in self._wh_cache:
            with open(image_file, "rb") as f:
                head = f.read(24)
            w = int.from_bytes(head[16:20], "big")
            h = int.from_bytes(head[20:24], "big")
            self._wh_cache[image_file] = (w, h // self.num_frames)
        return self._wh_cache[image_file]

    def sample_intrinsics(self, idx):
        """Per-sample (K, K_inv) rescaled to the network resolution.

        NOTE: the reference's ``rescale_intrinsics`` (kitti_prepared.py:111)
        scales the x row by the HEIGHT ratio and vice versa; that code is dead
        there (intrinsics are never returned).  This live path scales
        correctly: fx/cx by W, fy/cy by H.
        """
        data = self.data_list[idx]
        K = self.read_cam_intrinsic(data["cam_intrinsic_file"]).copy()
        ow, oh = self._orig_frame_wh(data["image_file"])
        K[0, :] *= self.img_hw[1] / ow
        K[1, :] *= self.img_hw[0] / oh
        return K.astype(np.float32), np.linalg.inv(K).astype(np.float32)

    def __getitem__(self, idx):
        """Returns (num_frames*H, W, 3) float32 in [0, 1];
        with ``return_intrinsics``: (img, K (3,3), K_inv (3,3))."""
        rng = None
        if self.num_iterations is not None:
            if idx >= self.num_iterations:
                raise IndexError(idx)
            idx, rng = self.rand_num(idx)
        raw = self._resized_uint8(idx)
        if self.return_intrinsics:  # no flip: it would falsify the geometry
            K, K_inv = self.sample_intrinsics(idx)
            if self.emit_uint8:
                return np.ascontiguousarray(raw, dtype=np.uint8), K, K_inv
            return np.ascontiguousarray(raw, dtype=np.float32) / 255.0, K, K_inv
        img = _maybe_flip(raw, rng or np.random)
        if self.emit_uint8:
            return np.ascontiguousarray(img, dtype=np.uint8)
        return np.ascontiguousarray(img, dtype=np.float32) / 255.0


class KITTI_Prepared(StackedFrameDataset):
    """KITTI raw/odometry prepared 3-frame dataset (kitti_prepared.py:10-153)."""

    num_frames = 3


class SINTEL_Prepared(StackedFrameDataset):
    """Sintel prepared 3-frame dataset, no intrinsics (sintel_prepared.py)."""

    num_frames = 3
    has_intrinsics = False


class NYU_v2(StackedFrameDataset):
    """NYUv2 prepared 2-frame dataset with undistortion (nyu_v2.py:168-320).

    Returns (img, K_ms, K_inv_ms); train.py's flow mode cannot consume the
    tuple in the reference either (SURVEY.md §2.2, documented quirk) — the
    depth/pose modes are the consumers.
    """

    num_frames = 2
    UNDIST_COEFF = np.array(
        [2.07966153e-01, -5.8613825e-01, 7.223136313e-04, 1.047962719e-03, 4.98569866e-01]
    )

    def __init__(self, data_dir, num_scales=3, img_hw=(448, 576), num_iterations=None):
        super().__init__(data_dir, num_scales, img_hw, num_iterations)
        self._maps = None  # cached undistort-rectify maps (nyu_v2.py:235-237)

    def undistort_img(self, img, K):
        import cv2

        h2 = img.shape[0] // 2
        img1, img2 = img[:h2], img[h2:]
        h, w = img1.shape[:2]
        if self._maps is None:
            newK, roi = cv2.getOptimalNewCameraMatrix(
                K, self.UNDIST_COEFF, (w, h), 1, (w, h)
            )
            mapx, mapy = cv2.initUndistortRectifyMap(
                K, self.UNDIST_COEFF, None, newK, (w, h), 5
            )
            self._maps = (mapx, mapy, roi)
        mapx, mapy, roi = self._maps
        x, y, rw, rh = roi
        out = [
            cv2.remap(i, mapx, mapy, cv2.INTER_LINEAR)[y : y + rh, x : x + rw]
            for i in (img1, img2)
        ]
        return np.concatenate(out, 0)

    def __getitem__(self, idx):
        rng = None
        if self.num_iterations is not None:
            if idx >= self.num_iterations:
                raise IndexError(idx)
            idx, rng = self.rand_num(idx)
        data = self.data_list[idx]
        img = _imread(data["image_file"])
        img_hw_orig = (img.shape[0] // 2, img.shape[1])

        K_orig = self.read_cam_intrinsic(data["cam_intrinsic_file"])
        K = self.rescale_intrinsics(K_orig.copy(), img_hw_orig, self.img_hw)
        K_ms, K_inv_ms = self.get_multiscale_intrinsics(K, self.num_scales)

        img = self.undistort_img(img, K_orig)
        img = self.resize_img(img, self.img_hw).astype(np.float32) / 255.0
        return img, K_ms.astype(np.float32), K_inv_ms.astype(np.float32)


class KITTI_2012(StackedFrameDataset):
    """KITTI 2012 eval pairs: image_2/%06d_10|_11.png (kitti_2012.py:13-55)."""

    num_frames = 2
    num_total = 194

    def __init__(self, data_dir, img_hw=(256, 832)):
        self.data_dir = data_dir
        self.img_hw = tuple(img_hw)
        self.num_scales = 3
        self.num_iterations = None
        self.data_list = self.get_data_list()

    def get_data_list(self):
        return [
            {
                "img1_dir": os.path.join(self.data_dir, "image_2", f"{i:06d}_10.png"),
                "img2_dir": os.path.join(self.data_dir, "image_2", f"{i:06d}_11.png"),
                "calib_file_dir": os.path.join(
                    self.data_dir, "calib_cam_to_cam", f"{i:06d}.txt"
                ),
            }
            for i in range(self.num_total)
        ]

    def __len__(self):
        return len(self.data_list)

    def __getitem__(self, idx):
        """Returns (2*H, W, 3) float32 pair stack, no flip (is_test)."""
        data = self.data_list[idx]
        img = np.concatenate(
            [_imread(data["img1_dir"]), _imread(data["img2_dir"])], 0
        )
        return self.preprocess_img(img, self.img_hw, is_test=True)


class KITTI_2015(KITTI_2012):
    """KITTI 2015 eval pairs (200 frames) (kitti_2015.py:5-10)."""

    num_total = 200
