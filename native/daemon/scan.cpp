#include "scan.h"

#include <algorithm>
#include <chrono>
#include <filesystem>
#include <fstream>
#include <thread>

namespace fs = std::filesystem;

namespace av1d {

std::string skip_marker_path(const std::string &file) {
  return file + ".av1skip";
}

std::string why_sidecar_path(const std::string &file) {
  return file + ".why.txt";
}

bool write_skip_marker(const std::string &file) {
  std::ofstream f(skip_marker_path(file));
  return (bool)f;
}

bool write_why_sidecar(const std::string &file, const std::string &reason,
                       bool enabled) {
  if (!enabled) return true;
  std::ofstream f(why_sidecar_path(file));
  if (!f) return false;
  f << reason << "\n";
  return true;
}

bool is_video_file(const std::string &path) {
  static const char *kExts[] = {".mkv", ".mp4", ".avi", ".mov",
                                ".m4v", ".ts", ".m2ts"};
  auto pos = path.find_last_of('.');
  if (pos == std::string::npos) return false;
  std::string ext = path.substr(pos);
  std::transform(ext.begin(), ext.end(), ext.begin(),
                 [](unsigned char c) { return (char)tolower(c); });
  for (const char *e : kExts)
    if (ext == e) return true;
  return false;
}

static void walk(const fs::path &dir, int depth,
                 std::vector<ScanCandidate> *out) {
  std::error_code ec;
  for (auto it = fs::directory_iterator(dir, ec);
       !ec && it != fs::directory_iterator(); it.increment(ec)) {
    const fs::path &p = it->path();
    std::string name = p.filename().string();
    if (it->is_directory(ec)) {
      if (!name.empty() && name[0] == '.') continue;  // hidden dir
      walk(p, depth + 1, out);
    } else if (it->is_regular_file(ec)) {
      std::string sp = p.string();
      if (!is_video_file(sp)) continue;
      if (fs::exists(skip_marker_path(sp), ec)) continue;
      ScanCandidate c;
      c.path = sp;
      c.size_bytes = fs::file_size(p, ec);
      auto t = fs::last_write_time(p, ec);
      c.mtime_secs = std::chrono::duration_cast<std::chrono::seconds>(
                         t.time_since_epoch()).count();
      out->push_back(std::move(c));
    }
  }
}

std::vector<ScanCandidate> scan_libraries(
    const std::vector<std::string> &roots) {
  std::vector<ScanCandidate> out;
  for (const auto &r : roots) {
    std::error_code ec;
    if (fs::is_directory(r, ec)) walk(r, 0, &out);
  }
  return out;
}

bool compare_sizes(uint64_t a, uint64_t b) { return a == b; }

StabilityResult check_stability(const std::string &path, int64_t wait_secs) {
  StabilityResult r;
  std::error_code ec;
  r.initial_size = fs::file_size(path, ec);
  if (ec) return r;
  if (wait_secs > 0)
    std::this_thread::sleep_for(std::chrono::seconds(wait_secs));
  r.final_size = fs::file_size(path, ec);
  if (ec) return r;
  r.stable = compare_sizes(r.initial_size, r.final_size);
  return r;
}

ConcurrencyPlan derive_plan(int logical_cores, double target_utilization,
                            int cfg_workers, int cfg_max_jobs) {
  ConcurrencyPlan p;
  p.total_cores = logical_cores > 0 ? logical_cores
                                    : (int)std::thread::hardware_concurrency();
  if (p.total_cores < 1) p.total_cores = 1;
  double util = std::clamp(target_utilization, 0.5, 1.0);
  p.target_threads = std::max(1, (int)(p.total_cores * util));
  p.workers_per_job =
      cfg_workers > 0 ? cfg_workers : (p.total_cores >= 32 ? 8 : 4);
  p.max_concurrent_jobs =
      cfg_max_jobs > 0 ? cfg_max_jobs : (p.total_cores >= 24 ? 1 : 2);
  return p;
}

}  // namespace av1d
