// Daemon configuration: TOML file + env-var overrides.
//
// Behavioral surface mirrors the reference config crate
// (crates/config/src/config.rs:205-219 sections; :245-283 env overrides;
// defaults at :50-52, :115-121, :149-159, :186-192), re-implemented in C++
// with a small built-in TOML-subset parser (sections, key = value with
// string/int/float/bool/array-of-strings).  The `[av1an]` section name is
// kept for drop-in config compatibility even though the encode plane is the
// TPU encoder; `[encoder]` is accepted as an alias.
#pragma once

#include <cstdint>
#include <string>
#include <vector>

namespace av1d {

struct CpuConfig {
  int logical_cores = 0;  // 0 = auto-detect
  double target_cpu_utilization = 0.85;
};

struct EncoderPoolConfig {   // reference: Av1anConfig
  int workers_per_job = 0;   // 0 = auto-derive
  int max_concurrent_jobs = 0;
};

struct EncoderSafetyConfig {
  bool disallow_hardware_encoding = true;
};

struct PathsConfig {
  std::string job_state_dir = "/var/lib/av1-daemon/jobs";
  std::string temp_output_dir = "/var/lib/av1-daemon/temp";
};

struct ScanConfig {
  std::vector<std::string> library_roots;
  int64_t stability_wait_secs = 10;
  bool write_why_sidecars = true;
  int64_t scan_interval_secs = 60;
};

struct GatesConfig {
  uint64_t min_bytes = 1048576;
  double max_size_ratio = 0.95;
  bool keep_original = false;
};

struct TpuConfig {  // rebuild-specific: the encode plane
  std::string encode_cmd;  // command template; empty = built-in default
  int qindex = 72;
  // per-job encode deadline; the backend process group is killed and the
  // job marked Failed when exceeded (0 = no timeout).  Fixes the
  // stuck-encoder hole SURVEY §5 flags in the reference.
  int encode_timeout_secs = 21600;
};

struct Config {
  CpuConfig cpu;
  EncoderPoolConfig av1an;
  EncoderSafetyConfig encoder_safety;
  PathsConfig paths;
  ScanConfig scan;
  GatesConfig gates;
  TpuConfig tpu;

  // Parse TOML text; unknown keys ignored, missing keys take defaults.
  // Returns false (and sets err) on malformed input.
  bool parse_toml(const std::string &text, std::string *err = nullptr);
  // Override from CPU_LOGICAL_CORES, CPU_TARGET_UTILIZATION,
  // AV1AN_WORKERS_PER_JOB, AV1AN_MAX_CONCURRENT_JOBS,
  // ENCODER_DISALLOW_HARDWARE_ENCODING.
  void apply_env_overrides();
  // load file + env overrides
  static bool load(const std::string &path, Config *out,
                   std::string *err = nullptr);
};

}  // namespace av1d
