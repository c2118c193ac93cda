"""Dataset layer tests: synthetic blender/posedir scenes on disk."""

import json
import os

import numpy as np
import pytest

from dreamfusion_tpu.datasets import DataProvider, DatasetFactory, load_data
from dreamfusion_tpu.datasets.provider import (ArrayDataset, DataLoaderLite,
                                               PartialDataset)
from dreamfusion_tpu.datasets.rays import (gather_training_rays,
                                           get_rays_np, get_rays_of_a_view,
                                           ndc_rays_np)


def _write_png(path, arr):
    from PIL import Image

    Image.fromarray((arr * 255).astype(np.uint8)).save(path)


@pytest.fixture
def blender_scene(tmp_path):
    base = tmp_path / "lego"
    rng = np.random.RandomState(0)
    for split, n in [("train", 3), ("val", 2), ("test", 2)]:
        frames = []
        os.makedirs(base / split, exist_ok=True)
        for i in range(n):
            name = f"./{split}/r_{i}"
            img = rng.rand(16, 16, 4)
            _write_png(str(base / split / f"r_{i}.png"), img)
            c2w = np.eye(4)
            c2w[2, 3] = 4.0
            frames.append({"file_path": name,
                           "transform_matrix": c2w.tolist()})
        with open(base / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.69, "frames": frames}, f)
    return str(base)


def test_load_blender(blender_scene):
    d = load_data({"dataset_type": "blender", "datadir": blender_scene})
    assert d["images"].shape == (7, 16, 16, 3)  # alpha blended to white
    assert d["poses"].shape == (7, 4, 4)
    assert len(d["i_train"]) == 3 and len(d["i_val"]) == 2
    assert d["near"] == 2.0 and d["far"] == 6.0
    assert d["Ks"].shape == (7, 3, 3)


def test_rays_and_ndc():
    K = np.array([[20.0, 0, 8], [0, 20.0, 8], [0, 0, 1]])
    c2w = np.eye(4)
    ro, rd = get_rays_np(16, 16, K, c2w)
    assert ro.shape == (16, 16, 3) and rd.shape == (16, 16, 3)
    # OpenGL convention: camera looks down -z
    assert rd[8, 8, 2] < 0
    o2, d2 = ndc_rays_np(16, 16, 20.0, 1.0, ro.reshape(-1, 3), rd.reshape(-1, 3))
    assert np.isfinite(o2).all() and np.isfinite(d2).all()
    # panoramic
    ro3, rd3, vd = get_rays_of_a_view(8, 16, K, c2w, img_type="panoramic")
    np.testing.assert_allclose(np.linalg.norm(vd, axis=-1), 1.0, rtol=1e-5)


def test_gather_and_provider(blender_scene):
    d = load_data({"dataset_type": "blender", "datadir": blender_scene})
    rgb, ro, rd, vd, imsz = gather_training_rays(d, {}, "i_train", "random")
    assert rgb.shape == (3 * 256, 3)
    assert list(imsz) == [256, 256, 256]

    provider = DataProvider({"name": "nerf", "data_dict": d,
                             "ray_sampler": "random", "batch_size": 128})
    batches = list(provider.train_dl)
    assert len(batches) == 6  # 768 / 128
    rd_b, ro_b, vd_b, rgb_b = batches[0]
    assert rd_b.shape == (128, 3) and rgb_b.shape == (128, 3)


def test_suffix_grammar():
    name, p = DatasetFactory.analyze_name("nerf_test", {"name": "nerf_test"})
    assert name == "nerf" and p["dataset_mapping"] == (2, 2, 2)
    name, p = DatasetFactory.analyze_name("nerf_swap", {"name": "x"})
    assert p["dataset_mapping"] == (1, 2, 0)
    name, p = DatasetFactory.analyze_name("nerf_partial", {"name": "x"})
    assert p["partial_train"]
    name, p = DatasetFactory.analyze_name("nerf_rand_noaug", {"name": "x"})
    assert name == "nerf" and p["rand_dataset"]  # suffixes strip until none match


def test_partial_and_loader_lite():
    ds = ArrayDataset(np.arange(10), np.arange(10) * 2)
    part = PartialDataset(ds, total=5, selected=2)
    assert list(part.arrays[0]) == [0, 1, 5, 6]
    dl = DataLoaderLite(ds, batch_size=4, shuffle=True, seed=1)
    assert len(dl) == 3
    seen = np.sort(np.concatenate([b[0] for b in dl]))
    np.testing.assert_array_equal(seen, np.arange(10))


def test_toydesk_format(tmp_path):
    base = tmp_path / "our_desk_1"
    os.makedirs(base)
    rng = np.random.RandomState(0)
    frames = []
    for i in range(4):
        _write_png(str(base / f"r_{i}.png"), rng.rand(8, 8, 3))
        pose = np.eye(4)
        pose[0, 3] = i
        frames.append({"file_path": f"./r_{i}", "idx": i,
                       "transform_matrix": pose.tolist()})
    with open(base / "transforms_full.json", "w") as f:
        json.dump({"camera_angle_x": 0.8, "frames": frames}, f)
    split = tmp_path / "split" / "our_desk_1_train_0.8"
    os.makedirs(split)
    (split / "train.txt").write_text("0\n1\n2\n")
    (split / "test.txt").write_text("3\n")
    # loader resolves split at basedir/../../split -> needs one more level
    scene = tmp_path / "scenes" / "our_desk_1"
    os.makedirs(scene.parent, exist_ok=True)
    os.rename(base, scene)
    d = load_data({"dataset_type": "toydesk", "datadir": str(scene)})
    assert len(d["i_train"]) == 3 and len(d["i_test"]) == 1
    assert d["near"] == 0.3 and d["far"] == 9.0


def test_standard_blendedmvs_format(tmp_path):
    base = tmp_path / "scan"
    os.makedirs(base / "cams")
    os.makedirs(base / "blended_images")
    rng = np.random.RandomState(0)
    n = 5
    (base / "cams" / "pair.txt").write_text(
        "\n".join([str(n)] + sum([[str(i), "0"] for i in range(n)], [])))
    for i in range(n):
        ext = np.eye(4)
        ext[2, 3] = -(2.0 + i * 0.1)  # w2c translation
        K = np.array([[10.0, 0, 4], [0, 10, 4], [0, 0, 1]])
        words = ["extrinsic"] + [str(v) for v in ext.reshape(-1)] + \
            ["intrinsic"] + [str(v) for v in K.reshape(-1)]
        (base / "cams" / f"{i:08d}_cam.txt").write_text(" ".join(words))
        _write_png(str(base / "blended_images" / f"{i:08d}_masked.jpg"),
                   rng.rand(8, 8, 3))
    d = load_data({"dataset_type": "standard_blendedmvs", "datadir": str(base)})
    assert d["images"].shape[0] == n
    assert d["Ks"][0][0, 0] == 10.0
    assert d["far"] > 0


def test_tankstemple360_and_omniscenes(tmp_path):
    rng = np.random.RandomState(0)
    base = tmp_path / "tt360"
    os.makedirs(base)
    n = 4
    np.save(base / "Ks.npy", np.tile(np.array([[10.0, 0, 4], [0, 10, 4],
                                               [0, 0, 1]]), (n, 1, 1)))
    np.save(base / "Rs.npy", np.tile(np.eye(3), (n, 1, 1)))
    np.save(base / "ts.npy", rng.rand(n, 3))
    for i in range(n):
        _write_png(str(base / f"im_{i:02d}.jpg"), rng.rand(8, 8, 3))
        np.save(base / f"dm_{i:02d}.npy", rng.rand(8, 8) * 3 + 1)
    d = load_data({"dataset_type": "tankstemple360", "datadir": str(base)})
    assert d["images"].shape[0] == n and d["near"] > 0

    omni = tmp_path / "pano"
    os.makedirs(omni)
    for i in range(4):
        _write_png(str(omni / f"seq_{i:03d}.jpg"), rng.rand(8, 16, 3))
        pose = np.hstack([np.eye(3), np.array([[i], [0], [2.0]])])
        (tmp_path / "pose").mkdir(exist_ok=True)
        np.savetxt(tmp_path / "pose" / f"seq_{i:03d}.txt", pose)
    d = load_data({"dataset_type": "omniscenes", "datadir": str(omni)})
    assert d["images"].shape[0] == 4


def test_stanford3d_format(tmp_path):
    import imageio.v2 as imageio

    rng = np.random.RandomState(0)
    base = tmp_path / "area"
    for sub in ("pose", "rgb", "depth"):
        os.makedirs(base / sub)
    for i in range(3):
        _write_png(str(base / "rgb" / f"{i:03d}.png"), rng.rand(8, 16, 3))
        depth = (rng.rand(8, 16) * 5000 + 100).astype(np.uint16)
        imageio.imwrite(str(base / "depth" / f"{i:03d}.png"), depth)
        with open(base / "pose" / f"{i:03d}.json", "w") as f:
            json.dump({"camera_rt_matrix":
                       np.hstack([np.eye(3), [[0], [0], [2.0]]]).tolist()}, f)
    d = load_data({"dataset_type": "stanford3D", "datadir": str(base)})
    assert d["images"].shape[0] == 3
    assert d["depths"] is not None
    assert d["far"] > d["near"] >= 0


def test_posedir_format(tmp_path):
    base = tmp_path / "scan"
    os.makedirs(base / "pose")
    os.makedirs(base / "rgb")
    rng = np.random.RandomState(0)
    for i, split in enumerate([0, 0, 1, 2]):
        pose = np.eye(4)
        pose[:3, 3] = [i, 0, 4]
        np.savetxt(base / "pose" / f"{split}_{i:03d}.txt", pose)
        _write_png(str(base / "rgb" / f"{split}_{i:03d}.png"), rng.rand(8, 8, 3))
    np.savetxt(base / "intrinsics.txt", np.array([[10.0, 0, 4], [0, 10, 4], [0, 0, 1]]))
    d = load_data({"dataset_type": "nsvf", "datadir": str(base)})
    assert d["images"].shape[0] == 4
    assert len(d["i_train"]) == 2
    assert d["far"] > d["near"] >= 0
