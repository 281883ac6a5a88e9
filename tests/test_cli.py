"""End-to-end CLI tests: container in -> container out with the real
pipeline (on the virtual CPU mesh).  The mux step must carry the original's
audio into the output (reference av1an.rs:96-97 `-c:a copy`)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "native", "build", "av1_tool")

pytestmark = pytest.mark.skipif(not os.path.exists(TOOL),
                                reason="av1_tool not built")


def _cli_env():
    env = os.environ.copy()
    env["JAX_PLATFORMS"] = "cpu"
    return env


def test_cli_mkv_to_mkv_preserves_audio(tmp_path):
    from av1tpu.utils import synthetic_clip, write_y4m

    clip = synthetic_clip(64, 64, 4, seed=11)
    y4m = str(tmp_path / "src.y4m")
    write_y4m(y4m, clip)
    src = str(tmp_path / "src.mkv")
    r = subprocess.run([TOOL, "encode", y4m, src, "--codec", "mpeg4",
                        "--audio", "tone"], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr

    out = str(tmp_path / "out.mkv")
    r = subprocess.run(
        [sys.executable, "-m", "av1tpu.cli", "encode", "-i", src, "-o", out,
         "--qindex", "140", "--preset", "fast", "--chunk", "2"],
        capture_output=True, text=True, cwd=REPO, env=_cli_env(),
        timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    stats = json.loads(lines[-1])
    assert stats["frames"] == 4
    assert stats["audio_streams"] == 1
    # progress lines were emitted before the stats line
    progress = [json.loads(ln) for ln in lines if "progress" in ln]
    assert progress and progress[-1]["progress"] == 1.0

    p = subprocess.run([TOOL, "probe", out], capture_output=True, text=True)
    info = json.loads(p.stdout)
    types = {s["type"]: s["codec"] for s in info["streams"]}
    assert types.get("video") == "av1"
    assert types.get("audio") == "pcm_s16le"
    assert info["format"].startswith("matroska")
    d = subprocess.run([TOOL, "decode", out], capture_output=True, text=True)
    assert json.loads(d.stdout)["frames"] == 4
