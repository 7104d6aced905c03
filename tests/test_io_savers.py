import json
import socket

import numpy as np
import pytest

from perception_tpu.io.imgcodec import array_to_image, convert_color, image_to_array
from perception_tpu.io.savers import (
    UdpSender,
    coco_keypoint_results,
    load_heatmaps,
    save_coco_json,
    save_heatmaps,
    save_people_json,
)


def test_people_json(tmp_path):
    kps = np.random.RandomState(0).rand(3, 5, 3).astype(np.float32)
    mask = np.array([True, False, True])
    p = tmp_path / "people.json"
    save_people_json(p, kps, mask, part_names=["a", "b", "c", "d", "e"])
    doc = json.loads(p.read_text())
    assert len(doc["people"]) == 2
    assert len(doc["people"][0]["pose_keypoints_2d"]) == 15


def test_coco_results_format(tmp_path):
    kps = np.zeros((2, 4, 3), np.float32)
    kps[0, :, :2] = 10
    kps[0, :, 2] = 0.9
    mask = np.array([True, False])
    res = coco_keypoint_results([42], [kps], [mask], [np.array([0.8, 0.0])])
    assert len(res) == 1
    assert res[0]["image_id"] == 42
    assert len(res[0]["keypoints"]) == 12
    assert res[0]["keypoints"][2] == 2  # visible flag
    save_coco_json(tmp_path / "c.json", res)
    assert json.loads((tmp_path / "c.json").read_text())[0]["score"] == pytest.approx(0.8)


def test_heatmap_roundtrip(tmp_path):
    hm = np.random.RandomState(1).rand(4, 16, 16).astype(np.float32)
    p = tmp_path / "hm.npz"
    save_heatmaps(p, hm)
    np.testing.assert_array_equal(load_heatmaps(p), hm)


def test_udp_roundtrip():
    recv = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    recv.bind(("127.0.0.1", 0))
    recv.settimeout(5.0)
    port = recv.getsockname()[1]
    sender = UdpSender("127.0.0.1", port)
    arr = np.arange(12, dtype=np.float32)
    sender.send_array(arr, tag=7)
    data, _ = recv.recvfrom(65536)
    seq, tag, back = UdpSender.parse(data)
    assert seq == 0 and tag == 7
    np.testing.assert_array_equal(back, arr)
    sender.close()
    recv.close()


def test_imgcodec_roundtrip():
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 255, (10, 12, 3), np.uint8)
    msg = array_to_image(arr, "rgb8")
    back = image_to_array(msg)
    np.testing.assert_array_equal(back, arr)


def test_imgcodec_mono16():
    arr = np.arange(20, dtype=np.uint16).reshape(4, 5) * 1000
    msg = array_to_image(arr, "mono16")
    np.testing.assert_array_equal(image_to_array(msg), arr)


def test_color_conversions():
    rng = np.random.RandomState(1)
    rgb = rng.randint(0, 255, (6, 6, 3), np.uint8)
    bgr = convert_color(rgb, "rgb8", "bgr8")
    np.testing.assert_array_equal(bgr[..., 0], rgb[..., 2])
    np.testing.assert_array_equal(convert_color(bgr, "bgr8", "rgb8"), rgb)
    gray = convert_color(rgb, "rgb8", "mono8")
    assert gray.shape == (6, 6)
    # cv2 parity for grayscale.
    import cv2

    expected = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY)
    assert np.abs(gray.astype(int) - expected.astype(int)).max() <= 1
    rgba = convert_color(rgb, "rgb8", "rgba8")
    assert rgba.shape == (6, 6, 4) and (rgba[..., 3] == 255).all()


def test_unsupported_encoding():
    with pytest.raises(ValueError):
        array_to_image(np.zeros((2, 2)), "yuv422")
