"""Data pipeline tests on a synthetic prepared directory (no downloads)."""

import os

import numpy as np
import pytest

from unopticalflow_tpu.data import (
    KITTI_2015,
    KITTI_Prepared,
    SINTEL_Prepared,
    BatchLoader,
)

IMG_H, IMG_W = 20, 40  # raw frame size on disk (resized by the dataset)


def _write_png(path, arr):
    import cv2

    cv2.imwrite(path, arr)


@pytest.fixture(scope="module")
def prepared_dir(tmp_path_factory):
    """Synthetic prepared dir: 5 stacked triplets + calib + train.txt."""
    root = tmp_path_factory.mktemp("prepared")
    drive = root / "2011_09_26" / "drive_0001"
    drive.mkdir(parents=True)
    rng = np.random.RandomState(0)
    lines = []
    for i in range(5):
        stacked = rng.randint(0, 255, (3 * IMG_H, IMG_W, 3), dtype=np.uint8)
        name = f"{i:010d}.png"
        _write_png(str(drive / name), stacked)
        lines.append(f"2011_09_26/drive_0001/{name} 2011_09_26/calib_cam_to_cam.txt\n")
    (root / "2011_09_26").mkdir(exist_ok=True)
    with open(root / "2011_09_26" / "calib_cam_to_cam.txt", "w") as f:
        f.write("P_rect_02: 700.0 0.0 600.0 0.0 0.0 700.0 180.0 0.0 0.0 0.0 1.0 0.0\n")
    with open(root / "train.txt", "w") as f:
        f.writelines(lines)
    return str(root)


def test_kitti_prepared_shapes(prepared_dir):
    ds = KITTI_Prepared(prepared_dir, img_hw=(16, 32), num_iterations=None)
    assert len(ds) == 5
    sample = ds[0]
    assert sample.shape == (3 * 16, 32, 3)
    assert sample.dtype == np.float32
    assert 0.0 <= sample.min() and sample.max() <= 1.0


def test_idx_seeded_determinism(prepared_dir):
    """Same idx -> bit-identical sample (kitti_prepared.py:38-42 semantics)."""
    ds = KITTI_Prepared(prepared_dir, img_hw=(16, 32), num_iterations=100)
    assert len(ds) == 100
    a = ds[7]
    b = ds[7]
    np.testing.assert_array_equal(a, b)
    with pytest.raises(IndexError):
        ds[100]


def test_intrinsics_pipeline(prepared_dir):
    ds = KITTI_Prepared(prepared_dir, img_hw=(16, 32), num_iterations=None)
    K = ds.read_cam_intrinsic(ds.data_list[0]["cam_intrinsic_file"])
    assert K.shape == (3, 3) and K[0, 0] == 700.0
    K_scaled = ds.rescale_intrinsics(K.copy(), (IMG_H, IMG_W), (16, 32))
    assert np.isclose(K_scaled[0, 0], 700.0 * 16 / IMG_H)
    K_ms, K_inv_ms = ds.get_multiscale_intrinsics(K_scaled, 3)
    assert K_ms.shape == (3, 3, 3) and K_inv_ms.shape == (3, 3, 3)
    np.testing.assert_allclose(K_ms[1, 0, 0], K_ms[0, 0, 0] / 2)
    np.testing.assert_allclose(
        K_ms[2] @ K_inv_ms[2], np.eye(3), rtol=1e-6, atol=1e-9
    )


def test_batch_loader(prepared_dir):
    ds = KITTI_Prepared(prepared_dir, img_hw=(16, 32), num_iterations=10)
    loader = BatchLoader(ds, batch_size=4, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3  # 4 + 4 + 2
    assert batches[0].shape == (4, 48, 32, 3)
    assert batches[-1].shape == (2, 48, 32, 3)
    # deterministic reload
    batches2 = list(BatchLoader(ds, batch_size=4, num_workers=2))
    np.testing.assert_array_equal(batches[0], batches2[0])


def test_batch_loader_drop_last(prepared_dir):
    ds = KITTI_Prepared(prepared_dir, img_hw=(16, 32), num_iterations=10)
    loader = BatchLoader(ds, batch_size=4, num_workers=1, drop_last=True)
    assert len(list(loader)) == 2


def test_sintel_prepared_no_intrinsics(tmp_path):
    import cv2

    scene = tmp_path / "alley_1"
    scene.mkdir()
    rng = np.random.RandomState(1)
    lines = []
    for i in range(3):
        stacked = rng.randint(0, 255, (3 * IMG_H, IMG_W, 3), dtype=np.uint8)
        cv2.imwrite(str(scene / f"{i:010d}.png"), stacked)
        lines.append(f"alley_1/{i:010d}.png\n")
    with open(tmp_path / "train.txt", "w") as f:
        f.writelines(lines)
    ds = SINTEL_Prepared(str(tmp_path), img_hw=(16, 32), num_iterations=None)
    assert ds[1].shape == (48, 32, 3)


def test_kitti_2015_eval_dataset(tmp_path):
    import cv2

    img_dir = tmp_path / "image_2"
    img_dir.mkdir()
    rng = np.random.RandomState(2)
    for i in range(2):
        for suffix in ("_10", "_11"):
            cv2.imwrite(
                str(img_dir / f"{i:06d}{suffix}.png"),
                rng.randint(0, 255, (IMG_H, IMG_W, 3), dtype=np.uint8),
            )
    ds = KITTI_2015(str(tmp_path), img_hw=(16, 32))
    assert len(ds) == 200  # manifest is synthetic; only first 2 readable
    pair = ds[1]
    assert pair.shape == (32, 32, 3)
    np.testing.assert_array_equal(pair, ds[1])  # no flip at test time


def test_batch_loader_early_exit_no_leak(prepared_dir):
    import threading

    ds = KITTI_Prepared(prepared_dir, img_hw=(16, 32), num_iterations=40)
    before = threading.active_count()
    it = iter(BatchLoader(ds, batch_size=2, num_workers=2, prefetch_batches=1))
    next(it)
    del it  # abandon mid-iteration: producer must observe stop and exit
    import gc, time

    gc.collect()
    for _ in range(50):
        if threading.active_count() <= before:
            break
        time.sleep(0.1)
    assert threading.active_count() <= before + 1


def test_platform_resolver():
    from unopticalflow_tpu.utils.platform import resolve_pallas

    assert resolve_pallas("on") is True
    assert resolve_pallas("off") is False
    assert resolve_pallas(True) is True
    assert resolve_pallas("auto") in (True, False)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        resolve_pallas("bogus")


def test_decoded_cache(prepared_dir, tmp_path):
    ds_plain = KITTI_Prepared(prepared_dir, img_hw=(16, 32), num_iterations=20)
    ds_cached = KITTI_Prepared(
        prepared_dir, img_hw=(16, 32), num_iterations=20,
        cache_dir=str(tmp_path / "cache"),
    )
    for idx in (0, 7, 13):
        np.testing.assert_array_equal(ds_plain[idx], ds_cached[idx])
        np.testing.assert_array_equal(ds_plain[idx], ds_cached[idx])  # warm hit
    assert len(os.listdir(tmp_path / "cache")) > 0


def test_kitti_raw_prepare_with_vendored_eigen_lists(tmp_path, monkeypatch):
    """KITTI_RAW.prepare_data_mp on a synthetic raw tree, filtering with the
    REAL vendored Eigen split files (data/eigen/*.txt; reference ships the
    same tables, kitti_raw.py:73-98):

    * drive_0117 is in test_scenes.txt -> excluded wholesale;
    * drive_0017 has static frames 0,1,4.. -> every 3-frame window at
      stride 1 over frames 0..7 hits one -> contributes zero snippets;
    * drive_0001 appears in neither list -> all windows survive.
    """
    from unopticalflow_tpu.data.preparers import KITTI_RAW

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    static_txt = os.path.join(repo_root, "data/eigen/static_frames.txt")
    scenes_txt = os.path.join(repo_root, "data/eigen/test_scenes.txt")
    assert os.path.isfile(static_txt) and os.path.isfile(scenes_txt)

    raw = tmp_path / "raw"
    rng = np.random.RandomState(0)
    date = "2011_09_26"
    n_frames = 8
    for drive in ("0001", "0017", "0117"):
        img_dir = raw / date / f"{date}_drive_{drive}_sync" / "image_02" / "data"
        img_dir.mkdir(parents=True)
        for i in range(n_frames):
            _write_png(
                str(img_dir / f"{i:010d}.png"),
                rng.randint(0, 255, (IMG_H, IMG_W, 3), dtype=np.uint8),
            )
    with open(raw / date / "calib_cam_to_cam.txt", "w") as f:
        f.write("P_rect_02: 700.0 0.0 600.0 0.0 0.0 700.0 180.0 0.0 0.0 0.0 1.0 0.0\n")

    out = tmp_path / "prepared"
    prep = KITTI_RAW(str(raw), static_txt, scenes_txt)

    # the global train.txt is the completion sentinel multi-host waiters poll
    # (train.py): the calib files must already be in place when it is written
    import unopticalflow_tpu.data.preparers as preparers_mod

    orig_concat = preparers_mod._concat_manifests
    calib_present_at_sentinel = []

    def checking_concat(output_dir, manifests):
        calib_present_at_sentinel.append(
            os.path.isfile(os.path.join(output_dir, date, "calib_cam_to_cam.txt"))
        )
        return orig_concat(output_dir, manifests)

    monkeypatch.setattr(preparers_mod, "_concat_manifests", checking_concat)
    prep.prepare_data_mp(str(out), stride=1, num_processes=2)
    assert calib_present_at_sentinel == [True]

    with open(out / "train.txt") as f:
        lines = [line.strip() for line in f if line.strip()]
    # only drive_0001 contributes: frames 0..7 -> 6 snippets
    assert len(lines) == n_frames - 2
    assert all(f"{date}_drive_0001_sync" in line for line in lines)
    assert not (out / date / f"{date}_drive_0117_sync").exists()
    # drive_0017 was processed but fully static-filtered
    with open(out / date / f"{date}_drive_0017_sync" / "train.txt") as f:
        assert f.read().strip() == ""
    # calib copied next to the date dir (kitti_raw.py:133-135 semantics)
    assert (out / date / "calib_cam_to_cam.txt").is_file()
    # the produced dir is directly trainable
    ds = KITTI_Prepared(str(out), img_hw=(16, 32), num_iterations=None)
    assert len(ds) == n_frames - 2
    assert ds[0].shape == (3 * 16, 32, 3)


def test_emit_uint8_matches_float_path(prepared_dir):
    """emit_uint8 returns the SAME sample as the f32 path, deferring only
    the /255 cast (sources are 8-bit; cv2.resize preserves uint8)."""
    ds_f = KITTI_Prepared(prepared_dir, img_hw=(16, 32), num_iterations=20)
    ds_u = KITTI_Prepared(
        prepared_dir, img_hw=(16, 32), num_iterations=20, emit_uint8=True
    )
    for idx in (0, 3, 7):
        f = ds_f[idx]
        u = ds_u[idx]
        assert u.dtype == np.uint8
        np.testing.assert_array_equal(u.astype(np.float32) / 255.0, f)


def test_emit_uint8_device_cast_in_step():
    """A uint8 batch through the jitted step equals the f32 batch to 1 ULP
    (the cast happens on device before any model math; the extra /255 op
    shifts fusion boundaries, reassociating reduction epilogues)."""
    import jax
    import jax.numpy as jnp

    from unopticalflow_tpu.models import FlowModelConfig, init_flow_model
    from unopticalflow_tpu.training import create_train_state, make_train_step

    cfg = FlowModelConfig(num_scales=2, use_pallas_corr=False)
    weights = {"loss_pixel": 0.15, "loss_ssim": 0.85,
               "loss_flow_smooth": 10.0, "loss_flow_consis": 0.01}
    params = init_flow_model(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 255, (2, 3 * 64, 64, 3), dtype=np.uint8)

    step = make_train_step(cfg, weights, lr=1e-4)
    s1, m1 = step(create_train_state(jax.tree.map(jnp.copy, params)),
                  jnp.asarray(u8))
    step2 = make_train_step(cfg, weights, lr=1e-4)
    s2, m2 = step2(create_train_state(params),
                   jnp.asarray(u8.astype(np.float32) / 255.0))
    for k in m1:
        np.testing.assert_allclose(
            np.asarray(m1[k]), np.asarray(m2[k]), rtol=1e-6, atol=1e-7
        )
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        # fresh-state Adam moves weights by ~+-lr with the SIGN of the
        # gradient, so 1-ULP gradient reassociation can flip isolated
        # near-zero-gradient elements by up to ~lr (1e-4); a real dtype bug
        # would diverge at O(weight scale)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=2.5e-4
        )
