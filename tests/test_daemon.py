"""Integration tests for the C++ daemon: scan -> gates -> classify -> job ->
encode -> validate -> size-gate -> atomic replace, plus the /metrics HTTP
endpoint and the persistent job store.  The encode backend is injected via
[tpu].encode_cmd (a fake instant encoder copying a pre-built valid AV1 IVF),
per SURVEY §4's fake-backend recommendation; the rest of the pipeline is
fully real (libavformat probe, size gate, replace)."""

import json
import os
import shutil
import signal
import subprocess
import time
import urllib.request

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DAEMON = os.path.join(REPO, "native", "build", "av1tpu-daemon")
SELFTEST = os.path.join(REPO, "native", "build", "av1d_selftest")
TOOL = os.path.join(REPO, "native", "build", "av1_tool")

pytestmark = pytest.mark.skipif(not os.path.exists(DAEMON),
                                reason="daemon not built")


def test_cpp_unit_selftest():
    r = subprocess.run([SELFTEST], capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    """A non-AV1 mkv source + a small valid AV1 ivf (the fake encode
    output)."""
    base = tmp_path_factory.mktemp("fixtures")
    from av1tpu.utils import synthetic_clip, write_y4m
    clip = synthetic_clip(320, 180, 12, seed=3)
    y4m = str(base / "src.y4m")
    write_y4m(y4m, clip)
    mkv = str(base / "source.mkv")
    r = subprocess.run([TOOL, "encode", y4m, mkv, "--codec", "mpeg4",
                        "--audio", "tone"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    ivf = str(base / "encoded.ivf")
    r = subprocess.run([TOOL, "encode", y4m, ivf, "--codec", "libaom-av1",
                        "--preset", "8", "--crf", "50"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert os.path.getsize(ivf) < os.path.getsize(mkv)
    return {"mkv": mkv, "ivf": ivf}


def _write_config(tmp_path, library, fixtures, extra=""):
    stats = tmp_path / "stats.json"
    stats.write_text('{"psnr_y": 41.5, "tpu_vmaf": 93.2, "frames": 12}\n')
    cfg = tmp_path / "config.toml"
    cfg.write_text(f"""
[cpu]
logical_cores = 2

[scan]
library_roots = ["{library}"]
stability_wait_secs = 0
scan_interval_secs = 1

[paths]
job_state_dir = "{tmp_path}/jobs"
temp_output_dir = "{tmp_path}/temp"

[gates]
min_bytes = 1

[tpu]
encode_cmd = "sh -c 'cp {fixtures['ivf']} {{output}}; cat {stats}'"
{extra}
""")
    return str(cfg)


def _run_once(cfg):
    return subprocess.run([DAEMON, "--config", cfg, "--metrics-port", "0",
                           "--once"], capture_output=True, text=True,
                          timeout=120)


def test_full_pipeline_replaces_original(tmp_path, fixtures):
    lib = tmp_path / "library"
    lib.mkdir()
    target = lib / "Show.S01E01.WEBRip.mkv"
    shutil.copy(fixtures["mkv"], target)
    cfg = _write_config(tmp_path, lib, fixtures)

    r = _run_once(cfg)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "completed=1 failed=0" in r.stdout

    # original replaced in place (output is {id}.mkv so the name keeps its
    # .mkv extension, matching the reference's jobs.rs:187-188)
    assert target.exists()
    assert target.read_bytes() == open(fixtures["ivf"], "rb").read()
    # no backup kept (keep_original defaults false)
    assert not list(lib.glob("*.orig.*"))

    # job store: exactly one job, success/complete, classified web-like
    jobs = list((tmp_path / "jobs").glob("*.json"))
    assert len(jobs) == 1
    j = json.loads(jobs[0].read_text())
    assert j["status"] == "success"
    assert j["stage"] == "complete"
    assert j["source_type"] == "web-like"
    assert j["probe"]["video_streams"][0]["codec"] == "mpeg4"
    assert j["output_bytes"] == os.path.getsize(fixtures["ivf"])
    # quality stats parsed from the encoder's JSON line (the reference left
    # these fields forever empty)
    assert j["psnr_y"] == 41.5
    assert j["tpu_vmaf"] == 93.2

    # second cycle: nothing to do (file content is now AV1 -> gated)
    r2 = _run_once(cfg)
    assert "enqueued 0 job(s)" in r2.stdout


def test_gate_skip_writes_markers(tmp_path, fixtures):
    lib = tmp_path / "library"
    lib.mkdir()
    target = lib / "small.mkv"
    shutil.copy(fixtures["mkv"], target)
    cfg = _write_config(tmp_path, lib, fixtures)
    # min_bytes above the file size -> gate skip
    text = open(cfg).read().replace("min_bytes = 1",
                                    "min_bytes = 999999999")
    open(cfg, "w").write(text)

    r = _run_once(cfg)
    assert r.returncode == 0
    assert "enqueued 0 job(s)" in r.stdout
    assert target.exists()  # untouched
    assert (lib / "small.mkv.av1skip").exists()
    why = (lib / "small.mkv.why.txt").read_text()
    assert "minimum size" in why
    # marked files are excluded from the next scan
    r2 = _run_once(cfg)
    assert "enqueued 0 job(s)" in r2.stdout


def test_size_gate_rejects_and_preserves_original(tmp_path, fixtures):
    lib = tmp_path / "library"
    lib.mkdir()
    target = lib / "movie.bluray.mkv"
    shutil.copy(fixtures["mkv"], target)
    # fake encoder output = an AV1 ivf padded LARGER than the original
    big = tmp_path / "big.ivf"
    data = open(fixtures["ivf"], "rb").read()
    pad = os.path.getsize(target) - len(data) + 4096
    big.write_bytes(data + b"\0" * pad)
    cfg = _write_config(tmp_path, lib, {"ivf": str(big)})

    r = _run_once(cfg)
    assert r.returncode == 0
    assert "completed=0" in r.stdout
    assert target.exists()  # original preserved
    assert (lib / "movie.bluray.mkv.av1skip").exists()
    jobs = [json.loads(p.read_text())
            for p in (tmp_path / "jobs").glob("*.json")]
    assert len(jobs) == 1
    assert jobs[0]["status"] == "skipped"
    assert jobs[0]["stage"] == "size_gating"
    assert jobs[0]["source_type"] == "disc-like"
    # temp output cleaned up
    assert not list((tmp_path / "temp").glob("*.ivf"))


def test_failed_encode_marks_job_failed(tmp_path, fixtures):
    lib = tmp_path / "library"
    lib.mkdir()
    shutil.copy(fixtures["mkv"], lib / "x.mkv")
    cfg = _write_config(tmp_path, lib, fixtures)
    text = open(cfg).read()
    text = text.replace(f"cp {fixtures['ivf']}", "false # ")
    open(cfg, "w").write(text)

    r = _run_once(cfg)
    assert "failed=1" in r.stdout
    assert (lib / "x.mkv").exists()
    jobs = [json.loads(p.read_text())
            for p in (tmp_path / "jobs").glob("*.json")]
    assert jobs[0]["status"] == "failed"
    assert "status" in jobs[0]["error"] or "output" in jobs[0]["error"]


def test_hardware_flag_rejected_at_startup(tmp_path, fixtures):
    lib = tmp_path / "library"
    lib.mkdir()
    cfg = _write_config(tmp_path, lib, fixtures)
    text = open(cfg).read().replace(
        f"cp {fixtures['ivf']}", "encoder --enable-nvenc ")
    open(cfg, "w").write(text)
    r = _run_once(cfg)
    assert r.returncode == 1
    assert "nvenc" in r.stdout + r.stderr


def test_concurrent_jobs_run_in_parallel(tmp_path, fixtures):
    """max_concurrent_jobs=2: two slow encodes must overlap (wall time well
    under 2x the single-job time), mirroring the reference's semaphore
    contention tests (job_executor.rs:655-692)."""
    lib = tmp_path / "library"
    lib.mkdir()
    shutil.copy(fixtures["mkv"], lib / "a.webrip.mkv")
    shutil.copy(fixtures["mkv"], lib / "b.webrip.mkv")
    cfg = _write_config(tmp_path, lib, fixtures)
    text = open(cfg).read().replace(
        "[cpu]\nlogical_cores = 2",
        "[cpu]\nlogical_cores = 2\n[av1an]\nmax_concurrent_jobs = 2")
    # each fake encode sleeps 2s; serial would take >= 4s
    text = text.replace(f"cp {fixtures['ivf']}",
                        f"sleep 2; cp {fixtures['ivf']}")
    open(cfg, "w").write(text)

    t0 = time.time()
    r = _run_once(cfg)
    wall = time.time() - t0
    assert "completed=2 failed=0" in r.stdout
    assert wall < 3.8, f"jobs did not overlap: {wall:.1f}s"
    assert (lib / "a.webrip.mkv").exists() and (lib / "b.webrip.mkv").exists()


def test_replace_preserves_audio_and_container(tmp_path, fixtures):
    """The flagship data-integrity property the round-1 build lost: after a
    replace, the file must still be .mkv and keep the original's audio
    track (reference av1an.rs:96-97 `-c:a copy`).  The fake backend runs
    the REAL mux step (av1_tool mux) over the real original."""
    lib = tmp_path / "library"
    lib.mkdir()
    target = lib / "Show.S01E02.WEBRip.mkv"
    shutil.copy(fixtures["mkv"], target)
    cfg = _write_config(tmp_path, lib, fixtures)
    text = open(cfg).read().replace(
        f"cp {fixtures['ivf']} {{output}}",
        f"{TOOL} mux {fixtures['ivf']} {{input}} {{output}} >/dev/null")
    open(cfg, "w").write(text)

    r = _run_once(cfg)
    assert "completed=1 failed=0" in r.stdout, r.stdout + r.stderr
    assert target.exists()

    # replaced file: AV1 video + the original's PCM audio track intact
    p = subprocess.run([TOOL, "probe", str(target)],
                       capture_output=True, text=True)
    info = json.loads(p.stdout)
    types = {s["type"]: s["codec"] for s in info["streams"]}
    assert types.get("video") == "av1"
    assert types.get("audio") == "pcm_s16le"
    assert info["format"].startswith("matroska")
    # and the audio is decodable alongside the video
    d = subprocess.run([TOOL, "decode", str(target)],
                       capture_output=True, text=True)
    assert json.loads(d.stdout)["frames"] == 12


def test_encode_timeout_kills_stuck_job(tmp_path, fixtures):
    """[tpu].encode_timeout_secs: a hung encoder backend is killed (whole
    process group) and the job marked failed, freeing the worker slot —
    fixes the stuck-encoder hole SURVEY §5 flags in the reference."""
    lib = tmp_path / "library"
    lib.mkdir()
    shutil.copy(fixtures["mkv"], lib / "stuck.mkv")
    cfg = _write_config(tmp_path, lib, fixtures,
                        extra="encode_timeout_secs = 2")
    text = open(cfg).read().replace(
        f"cp {fixtures['ivf']} {{output}}; ", "sleep 300; : ")
    open(cfg, "w").write(text)

    t0 = time.time()
    r = _run_once(cfg)
    wall = time.time() - t0
    assert "failed=1" in r.stdout, r.stdout + r.stderr
    assert wall < 60, f"timeout did not fire: {wall:.1f}s"
    assert (lib / "stuck.mkv").exists()  # original untouched
    jobs = [json.loads(p.read_text())
            for p in (tmp_path / "jobs").glob("*.json")]
    assert jobs[0]["status"] == "failed"
    assert "timed out" in jobs[0]["error"]


def test_live_progress_updates_metrics(tmp_path, fixtures):
    """Progress lines printed by the encode backend must surface in
    /metrics while the encode is still running (reference drift #5: its
    Progress/FPS columns never moved)."""
    lib = tmp_path / "library"
    lib.mkdir()
    shutil.copy(fixtures["mkv"], lib / "slow.webrip.mkv")
    cfg = _write_config(tmp_path, lib, fixtures)
    progfile = tmp_path / "prog.json"
    progfile.write_text('{"progress": 0.5, "frames_encoded": 6, '
                        '"total_frames": 12, "fps": 3.0}\n')
    text = open(cfg).read().replace(
        f"cp {fixtures['ivf']}",
        f"cat {progfile}; sleep 4; cp {fixtures['ivf']}")
    open(cfg, "w").write(text)

    port = 17879
    proc = subprocess.Popen(
        [DAEMON, "--config", cfg, "--metrics-port", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    try:
        seen_progress = 0.0
        seen_fps = 0.0
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/metrics", timeout=2) as u:
                    snap = json.loads(u.read())
                for jm in snap["jobs"]:
                    if jm["stage"] == "encoding" and jm["progress"] > 0:
                        seen_progress = jm["progress"]
                        seen_fps = jm["fps"]
                if seen_progress > 0:
                    break
            except (ConnectionError, OSError):
                pass
            time.sleep(0.2)
        assert seen_progress == 0.5, "no live progress observed mid-encode"
        assert seen_fps == 3.0
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=20)
        except subprocess.TimeoutExpired:
            proc.kill()


def test_metrics_endpoint(tmp_path, fixtures):
    lib = tmp_path / "library"
    lib.mkdir()
    shutil.copy(fixtures["mkv"], lib / "a.webrip.mkv")
    cfg = _write_config(tmp_path, lib, fixtures)
    port = 17878
    proc = subprocess.Popen(
        [DAEMON, "--config", cfg, "--metrics-port", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    try:
        snap = None
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/metrics", timeout=2) as u:
                    assert u.headers["Content-Type"] == "application/json"
                    snap = json.loads(u.read())
                if snap["completed_jobs"] >= 1:
                    break
            except (ConnectionError, OSError):
                pass
            time.sleep(0.5)
        assert snap is not None, "metrics endpoint never came up"
        assert snap["completed_jobs"] >= 1
        assert snap["total_bytes_encoded"] == os.path.getsize(fixtures["ivf"])
        for key in ("timestamp_unix_ms", "jobs", "system", "queue_len",
                    "running_jobs", "failed_jobs"):
            assert key in snap
        for key in ("cpu_usage_percent", "mem_usage_percent", "load_avg_1",
                    "load_avg_5", "load_avg_15"):
            assert key in snap["system"]
        # 404 for other paths
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/other",
                                   timeout=2)
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=20)
        except subprocess.TimeoutExpired:
            proc.kill()
