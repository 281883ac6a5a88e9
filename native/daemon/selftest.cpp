// Unit self-test for the daemon's pure decision logic (config parsing, env
// overrides, plan derivation, gates, classifier, size gate, job JSON
// round-trip, encoder command safety).  Mirrors the reference's
// property-per-requirement test discipline (SURVEY §4) in assertion form;
// exercised from pytest via tests/test_daemon.py.
#include <cassert>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include "config.h"
#include "encoder.h"
#include "jobs.h"
#include "probe.h"
#include "replace.h"
#include "scan.h"

using namespace av1d;

#define CHECK(cond)                                                     \
  do {                                                                  \
    if (!(cond)) {                                                      \
      fprintf(stderr, "CHECK failed at %s:%d: %s\n", __FILE__, __LINE__, \
              #cond);                                                   \
      return 1;                                                         \
    }                                                                   \
  } while (0)

static int test_config() {
  Config c;
  std::string err;
  CHECK(c.parse_toml(
      "[cpu]\nlogical_cores = 10\ntarget_cpu_utilization = 0.85\n"
      "[av1an]\nworkers_per_job = 4\nmax_concurrent_jobs = 1\n"
      "[encoder_safety]\ndisallow_hardware_encoding = true\n"
      "[paths]\njob_state_dir = \"/tmp/js\"\ntemp_output_dir = \"/tmp/to\"\n"
      "[scan]\nlibrary_roots = [\"/a\", \"/b\"]\nstability_wait_secs = 0\n"
      "[gates]\nmin_bytes = 42\nmax_size_ratio = 0.9\n", &err));
  CHECK(c.cpu.logical_cores == 10);
  CHECK(c.av1an.workers_per_job == 4);
  CHECK(c.av1an.max_concurrent_jobs == 1);
  CHECK(c.encoder_safety.disallow_hardware_encoding);
  CHECK(c.paths.job_state_dir == "/tmp/js");
  CHECK(c.scan.library_roots.size() == 2 && c.scan.library_roots[1] == "/b");
  CHECK(c.gates.min_bytes == 42);
  // defaults fill in
  Config d;
  CHECK(d.parse_toml("", &err));
  CHECK(d.cpu.target_cpu_utilization == 0.85);
  CHECK(d.scan.stability_wait_secs == 10);
  CHECK(d.scan.scan_interval_secs == 60);
  CHECK(d.gates.min_bytes == 1048576);
  CHECK(d.gates.max_size_ratio == 0.95);
  // env overrides
  setenv("CPU_LOGICAL_CORES", "7", 1);
  setenv("AV1AN_MAX_CONCURRENT_JOBS", "3", 1);
  setenv("ENCODER_DISALLOW_HARDWARE_ENCODING", "no", 1);
  d.apply_env_overrides();
  CHECK(d.cpu.logical_cores == 7);
  CHECK(d.av1an.max_concurrent_jobs == 3);
  CHECK(!d.encoder_safety.disallow_hardware_encoding);
  unsetenv("CPU_LOGICAL_CORES");
  unsetenv("AV1AN_MAX_CONCURRENT_JOBS");
  unsetenv("ENCODER_DISALLOW_HARDWARE_ENCODING");
  // malformed input is rejected
  Config e;
  CHECK(!e.parse_toml("[cpu\nlogical_cores = 2\n", &err));
  return 0;
}

static int test_plan() {
  // reference derivation rules (concurrency.rs:67-89)
  ConcurrencyPlan p = derive_plan(32, 0.85, 0, 0);
  CHECK(p.workers_per_job == 8 && p.max_concurrent_jobs == 1);
  p = derive_plan(16, 0.85, 0, 0);
  CHECK(p.workers_per_job == 4 && p.max_concurrent_jobs == 2);
  p = derive_plan(24, 0.85, 0, 0);
  CHECK(p.max_concurrent_jobs == 1);
  p = derive_plan(8, 2.0, 0, 0);   // clamp utilization to 1.0
  CHECK(p.target_threads == 8);
  p = derive_plan(8, 0.1, 0, 0);   // clamp to 0.5
  CHECK(p.target_threads == 4);
  p = derive_plan(8, 0.85, 6, 3);  // explicit config wins
  CHECK(p.workers_per_job == 6 && p.max_concurrent_jobs == 3);
  return 0;
}

static int test_gates_classify() {
  ProbeResult pr;
  CHECK(!check_gates(pr, 1).proceed);  // no video streams
  VideoStream vs;
  vs.codec = "h264";
  vs.width = 1920;
  vs.height = 1080;
  pr.video_streams.push_back(vs);
  pr.format.size_bytes = 100;
  GateResult g = check_gates(pr, 1000);
  CHECK(!g.proceed && g.reason.find("minimum size") != std::string::npos);
  pr.format.size_bytes = 10000;
  CHECK(check_gates(pr, 1000).proceed);
  pr.video_streams[0].codec = "AV1";
  g = check_gates(pr, 1000);
  CHECK(!g.proceed && g.reason.find("already AV1") != std::string::npos);
  pr.video_streams[0].codec = "hevc";

  // classifier: keywords beat bitrate
  CHECK(classify_source("/lib/Show.S01.WEBRip.x264.mkv", pr) ==
        SourceType::WebLike);
  CHECK(classify_source("/lib/Movie.BluRay.REMUX.mkv", pr) ==
        SourceType::DiscLike);
  // bitrate path: 1080p ~ 2.07 MP; threshold 6000 kbps/MP
  pr.video_streams[0].bitrate_kbps = 4000;  // ~1930/MP -> web
  CHECK(classify_source("/lib/xyz.mkv", pr) == SourceType::WebLike);
  pr.video_streams[0].bitrate_kbps = 25000;  // ~12000/MP -> disc
  CHECK(classify_source("/lib/xyz.mkv", pr) == SourceType::DiscLike);
  pr.video_streams[0].bitrate_kbps = 0;  // unknown
  CHECK(classify_source("/lib/xyz.mkv", pr) == SourceType::Unknown);
  return 0;
}

static int test_size_gate() {
  CHECK(check_size_gate(1000, 949, 0.95).accepted);
  CHECK(!check_size_gate(1000, 950, 0.95).accepted);   // boundary: >= rejects
  CHECK(!check_size_gate(1000, 2000, 0.95).accepted);
  CHECK(!check_size_gate(0, 10, 0.95).accepted);       // zero original
  return 0;
}

static int test_job_json() {
  ProbeResult pr;
  VideoStream vs;
  vs.codec = "h264";
  vs.width = 1280;
  vs.height = 720;
  vs.bitrate_kbps = 2500.5;
  pr.video_streams.push_back(vs);
  pr.audio_streams.push_back({"aac"});
  pr.format.duration_secs = 61.25;
  pr.format.size_bytes = 123456789;
  pr.format.container = "matroska,webm";
  Job j = create_job("/lib/a video.mkv", pr, SourceType::WebLike, "/tmp/o");
  j.stage = JobStage::SizeGating;
  j.status = JobStatus::Running;
  j.error = "quote\" and\nnewline";
  j.output_bytes = 42;
  std::string text = job_to_json(j);
  Job k;
  CHECK(job_from_json(text, &k));
  CHECK(k.id == j.id);
  CHECK(k.input_path == j.input_path);
  CHECK(k.output_path == j.output_path);
  CHECK(k.stage == JobStage::SizeGating && k.status == JobStatus::Running);
  CHECK(k.source_type == SourceType::WebLike);
  CHECK(k.error == j.error);
  CHECK(k.output_bytes == 42);
  CHECK(k.probe.video_streams.size() == 1);
  CHECK(k.probe.video_streams[0].codec == "h264");
  CHECK(k.probe.video_streams[0].bitrate_kbps == 2500.5);
  CHECK(k.probe.format.size_bytes == 123456789);
  CHECK(k.is_active());
  k.status = JobStatus::Success;
  CHECK(!k.is_active());
  // uuids unique + v4 shaped
  Job j2 = create_job("/x.mkv", pr, SourceType::Unknown, "/tmp/o");
  CHECK(j2.id != j.id && j2.id.size() == 36 && j2.id[14] == '4');
  // garbage rejected
  Job g;
  CHECK(!job_from_json("{not json", &g));
  CHECK(!job_from_json("{\"x\": 1}", &g));
  return 0;
}

static int test_encoder_cmd() {
  EncodeParams p;
  p.input_path = "/lib/it's a file.mkv";
  p.output_path = "/tmp/out.ivf";
  p.qindex = 90;
  p.workers = 4;
  std::string cmd = build_encode_command("", p);
  CHECK(cmd.find("av1tpu.cli") != std::string::npos);
  CHECK(cmd.find("'/lib/it'\\''s a file.mkv'") != std::string::npos);
  CHECK(cmd.find("--qindex 90") != std::string::npos);
  std::string flag;
  CHECK(!command_has_hardware_flags(cmd, &flag));
  CHECK(command_has_hardware_flags("encoder --enable-NVENC", &flag));
  CHECK(flag == "nvenc");
  CHECK(command_has_hardware_flags("x -hwaccel vaapi", nullptr));
  // template substitution
  cmd = build_encode_command("enc {input} -> {output} q{qindex} w{workers}", p);
  CHECK(cmd == "enc '/lib/it'\\''s a file.mkv' -> '/tmp/out.ivf' q90 w4");
  return 0;
}

static int test_scan_bits() {
  CHECK(is_video_file("/a/b.mkv"));
  CHECK(is_video_file("/a/b.MKV"));
  CHECK(is_video_file("/a/b.m2ts"));
  CHECK(!is_video_file("/a/b.txt"));
  CHECK(!is_video_file("/a/noext"));
  CHECK(skip_marker_path("/a/b.mkv") == "/a/b.mkv.av1skip");
  CHECK(why_sidecar_path("/a/b.mkv") == "/a/b.mkv.why.txt");
  CHECK(compare_sizes(5, 5) && !compare_sizes(5, 6));
  CHECK(backup_path("/a/b.mkv", 1700000000) ==
        "/a/b.mkv.orig.1700000000");
  return 0;
}

int main() {
  int rc = 0;
  rc |= test_config();
  rc |= test_plan();
  rc |= test_gates_classify();
  rc |= test_size_gate();
  rc |= test_job_json();
  rc |= test_encoder_cmd();
  rc |= test_scan_bits();
  if (rc == 0) printf("selftest: all checks passed\n");
  return rc;
}
