// Library scanning, stability checking, skip markers, concurrency planning.
// Behavior mirrors the reference daemon crate: scan.rs (extension filter,
// hidden-dir skip, .av1skip exclusion), stability.rs (wait + re-stat),
// skip_marker.rs (.av1skip / .why.txt sidecars), concurrency.rs (plan
// derivation) — re-designed as plain C++ with std::filesystem.
#pragma once

#include <cstdint>
#include <string>
#include <vector>

namespace av1d {

struct ScanCandidate {
  std::string path;
  uint64_t size_bytes = 0;
  int64_t mtime_secs = 0;
};

// <file>.av1skip  (alongside the file)
std::string skip_marker_path(const std::string &file);
// <file>.why.txt
std::string why_sidecar_path(const std::string &file);
bool write_skip_marker(const std::string &file);
bool write_why_sidecar(const std::string &file, const std::string &reason,
                       bool enabled);

// extension in {mkv mp4 avi mov m4v ts m2ts}, case-insensitive
bool is_video_file(const std::string &path);

// Recursive walk of roots; skips hidden dirs (depth > 0), skips files with a
// sibling .av1skip marker.  Missing roots are ignored.
std::vector<ScanCandidate> scan_libraries(
    const std::vector<std::string> &roots);

struct StabilityResult {
  bool stable = false;
  uint64_t initial_size = 0;
  uint64_t final_size = 0;
};

// Pure decision: stable iff sizes match and file still exists (size query
// succeeded twice).
bool compare_sizes(uint64_t a, uint64_t b);

// stat, sleep wait_secs, re-stat.
StabilityResult check_stability(const std::string &path, int64_t wait_secs);

struct ConcurrencyPlan {
  int total_cores = 1;
  int target_threads = 1;
  int workers_per_job = 4;
  int max_concurrent_jobs = 2;
};

// Reference derivation (concurrency.rs:28-89): workers = 8 if >=32 cores
// else 4; max_jobs = 1 if >=24 cores else 2; utilization clamped [0.5, 1.0];
// explicit config values (nonzero) win.
ConcurrencyPlan derive_plan(int logical_cores, double target_utilization,
                            int cfg_workers, int cfg_max_jobs);

}  // namespace av1d
