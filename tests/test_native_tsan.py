"""ThreadSanitizer stress test for the native frame ring.

Builds io/native/frame_ring_test.cpp with -fsanitize=thread and runs it:
two producers race two consumers for 4000 frames; TSan must find no data
races and every popped frame must be untorn (SURVEY.md §5 "race
detection" — the reference had no concurrent state at all; we do, so we
sanitize it).
"""

import os
import shutil
import subprocess

import pytest

NATIVE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bugcar_image_segmentation_tpu", "io",
    "native")


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_frame_ring_tsan(tmp_path):
    binary = str(tmp_path / "frame_ring_tsan")
    build = subprocess.run(
        ["g++", "-O1", "-g", "-std=c++17", "-fsanitize=thread", "-pthread",
         os.path.join(NATIVE, "frame_ring.cpp"),
         os.path.join(NATIVE, "frame_ring_test.cpp"),
         "-o", binary],
        capture_output=True, text=True, timeout=120)
    assert build.returncode == 0, build.stderr
    run = subprocess.run([binary], capture_output=True, text=True,
                         timeout=120)
    assert run.returncode == 0, run.stdout + run.stderr
    assert "OK: no torn frames" in run.stdout
    assert "WARNING: ThreadSanitizer" not in run.stderr
