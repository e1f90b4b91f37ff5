"""On-disk format tests for the HRSC2016 / UCAS-AOD / ICDAR15 loaders.

Each test writes the dataset's NATIVE annotation format to disk and drives
the real loader, verifying the parsing and filter contracts the reference
implements (hrsc2016.py:37-42,108-123; ucas_aod.py:100-109;
icdar15.py:39-55,107-110).  The DOTA COCO path is covered in
tests/test_dota_on_disk.py.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _png(path, w=64, h=48):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.new("RGB", (w, h)).save(path)


def test_hrsc_xml_loader(tmp_path):
    from dafne_tpu.data.datasets.hrsc2016 import load_hrsc, xywha_to_corners

    root = tmp_path / "hrsc"
    os.makedirs(root / "ImageSets")
    os.makedirs(root / "labelXml")
    (root / "ImageSets" / "trainval.txt").write_text("100000001\n")
    (root / "labelXml" / "100000001.xml").write_text(
        """<HRSC_Image>
  <Img_SizeWidth>1100</Img_SizeWidth>
  <Img_SizeHeight>600</Img_SizeHeight>
  <HRSC_Objects>
    <HRSC_Object>
      <mbox_cx>200.5</mbox_cx><mbox_cy>150.25</mbox_cy>
      <mbox_w>100</mbox_w><mbox_h>40</mbox_h><mbox_ang>0.5</mbox_ang>
      <difficult>0</difficult>
    </HRSC_Object>
    <HRSC_Object>
      <mbox_cx>400</mbox_cx><mbox_cy>300</mbox_cy>
      <mbox_w>60</mbox_w><mbox_h>20</mbox_h><mbox_ang>-1.2</mbox_ang>
      <difficult>1</difficult>
    </HRSC_Object>
  </HRSC_Objects>
</HRSC_Image>"""
    )
    records = load_hrsc(str(root), "trainval")
    assert len(records) == 1
    r = records[0]
    assert (r["width"], r["height"]) == (1100, 600)
    assert r["file_name"].endswith("100000001.bmp")
    assert len(r["annotations"]) == 2
    a0, a1 = r["annotations"]
    # corners = rotation-matrix expansion of (cx, cy, w, h, ang)
    expect = xywha_to_corners(200.5, 150.25, 100, 40, 0.5).reshape(8)
    np.testing.assert_allclose(a0["corners"], expect, atol=1e-9)
    c = np.asarray(a0["corners"]).reshape(4, 2)
    np.testing.assert_allclose(c.mean(axis=0), [200.5, 150.25], atol=1e-9)
    # side lengths preserved under rotation
    d01 = np.linalg.norm(c[1] - c[0])
    d12 = np.linalg.norm(c[2] - c[1])
    assert sorted([round(d01), round(d12)]) == [40, 100]
    assert not a0["difficult"] and a1["difficult"]
    # hbox encloses the corners
    xs, ys = c[:, 0], c[:, 1]
    np.testing.assert_allclose(
        a0["bbox"], [xs.min(), ys.min(), xs.max(), ys.max()]
    )


def test_ucas_aod_txt_loader(tmp_path):
    from dafne_tpu.data.datasets.ucas_aod import load_ucas_aod

    root = tmp_path / "UCAS-AOD"
    os.makedirs(root / "ImageSets")
    os.makedirs(root / "Annotations")
    _png(str(root / "AllImages" / "P0001.png"), 640, 480)
    (root / "ImageSets" / "train.txt").write_text("P0001\n")
    (root / "Annotations" / "P0001.txt").write_text(
        "\n".join(
            [
                "car 10 10 50 10 50 30 10 30",
                "airplane 100 100 160 100 160 140 100 140",
                "__background__ 0 0 5 0 5 5 0 5",  # skipped
                "car 200 200 201 200 201 201 200 201",  # w,h <= 2: filtered
                "car 300 300 400 300 400 301 300 301",  # ar > 30: filtered
            ]
        )
    )
    records = load_ucas_aod(str(root), "train")
    assert len(records) == 1
    r = records[0]
    assert (r["width"], r["height"]) == (640, 480)
    assert r["image_id"] == "0001"  # leading P stripped
    labels = sorted(a["category_id"] for a in r["annotations"])
    assert labels == [0, 1]  # car, airplane; others filtered
    car = [a for a in r["annotations"] if a["category_id"] == 0][0]
    assert car["corners"] == [10, 10, 50, 10, 50, 30, 10, 30]
    assert car["bbox"] == [10, 10, 50, 30]


def test_icdar15_txt_loader(tmp_path):
    from dafne_tpu.data.datasets.icdar15 import load_icdar15

    root = tmp_path / "icdar-2015"
    os.makedirs(root / "ImageSets")
    os.makedirs(root / "Annotations" / "train")
    _png(str(root / "images" / "train" / "img_7.jpg"), 320, 240)
    # val split reads images+annotations from the train folder
    (root / "ImageSets" / "val.txt").write_text("gt_img_7\n")
    # utf-8-sig BOM like the real files; third line marks unreadable text
    (root / "Annotations" / "train" / "gt_img_7.txt").write_bytes(
        "﻿".encode("utf-8")
        + b"10,10,60,12,58,40,9,38,HELLO\n"
        + b"100,100,150,100,150,130,100,130,###\n"
        + b"5,5,6,5,6,6,5,6,tiny\n"  # filtered: w,h <= 2
    )
    records = load_icdar15(str(root), "val")
    assert len(records) == 1
    r = records[0]
    assert r["file_name"].endswith(os.path.join("train", "img_7.jpg"))
    assert (r["width"], r["height"]) == (320, 240)
    assert len(r["annotations"]) == 2
    readable, unreadable = r["annotations"]
    assert readable["corners"] == [10, 10, 60, 12, 58, 40, 9, 38]
    assert not readable["difficult"]
    assert unreadable["difficult"]  # "###" transcript -> difficult
    assert all(a["category_id"] == 0 for a in r["annotations"])
