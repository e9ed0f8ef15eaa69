"""CLI entry-point tests (headless paths), run as real subprocesses."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ,
           JAX_PLATFORMS="cpu",
           PYTHONPATH=REPO,
           TF_CPP_MIN_LOG_LEVEL="3")


def run(args, timeout=300):
    return subprocess.run([sys.executable] + args, capture_output=True,
                          text=True, env=ENV, timeout=timeout, cwd=REPO)


class TestCalibrateCLI:
    def test_headless_calibration_writes_reference_schema(self, tmp_path):
        out = tmp_path / "calib.json"
        r = run([f"{REPO}/scripts/calibrate.py",
                 "--corners", "210,170", "305,168", "330,235", "185,242",
                 "--input-size", "512x256", "--output-size", "512x512",
                 "--dist2target", "5,110", "--tile-length", "60",
                 "--cm-per-px", "2", "--yaw", "0.12",
                 "--out", str(out)])
        assert r.returncode == 0, r.stderr
        data = json.loads(out.read_text())
        # the reference's exact schema keys (reference bev.py:47-55)
        for key in ("input image size", "output image size", "bev matrix",
                    "distance to target", "tile_length", "cm_per_px",
                    "yaw", "is_laserscan"):
            assert key in data, key
        assert np.asarray(data["bev matrix"]).shape == (3, 3)

    def test_missing_mode_errors(self, tmp_path):
        r = run([f"{REPO}/scripts/calibrate.py", "--out",
                 str(tmp_path / "x.json")])
        assert r.returncode != 0


class TestStraightLineCLI:
    def test_writes_check_image_and_reports_straightness(self, tmp_path):
        calib = tmp_path / "calib.json"
        run([f"{REPO}/scripts/calibrate.py",
             "--corners", "210,170", "305,168", "330,235", "185,242",
             "--input-size", "512x256", "--output-size", "512x512",
             "--dist2target", "5,110", "--tile-length", "60",
             "--cm-per-px", "2", "--yaw", "0.12", "--out", str(calib)])
        png = tmp_path / "check.png"
        r = run([f"{REPO}/scripts/test_straight_line.py",
                 "--calib", str(calib), "--out", str(png)])
        assert r.returncode == 0, r.stderr
        assert png.exists() and png.stat().st_size > 0
        # homographies map straight lines to straight lines — deviation ~0
        dev = float(r.stdout.split("deviation")[1].split("px")[0])
        assert dev < 1e-6


class TestEvaluateCLI:
    def test_evaluates_tiny_dataset(self, tmp_path, rng):
        import cv2
        imgs = tmp_path / "imgs"
        lbls = tmp_path / "lbls"
        imgs.mkdir(), lbls.mkdir()
        for i in range(2):
            cv2.imwrite(str(imgs / f"{i}.png"),
                        rng.integers(0, 256, (48, 96, 3), dtype=np.uint8))
            cv2.imwrite(str(lbls / f"{i}.png"),
                        rng.integers(0, 15, (48, 96), dtype=np.uint8))
        # tiny model keeps the CPU run quick: patch via env-less default is
        # 512x256 — too slow for a unit test, so evaluate via the library
        # path in-process instead for the model, and use the CLI only for
        # plumbing with the smallest backbone (enet still compiles ~1min).
        r = run([f"{REPO}/scripts/evaluate_model.py", "--model", "enet",
                 "--images", str(imgs), "--labels", str(lbls)],
                timeout=900)
        assert r.returncode == 0, r.stderr
        result = json.loads(r.stdout)
        assert "pixel_accuracy" in result and "mean_iou" in result
        assert 0.0 <= result["pixel_accuracy"] <= 1.0
