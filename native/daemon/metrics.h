// Metrics model + /proc-based system sampling + minimal HTTP /metrics server.
//
// JSON schema matches the reference exactly (metrics.rs:12-53) so external
// dashboards (and our TUI) are drop-in compatible: GET /metrics on
// 127.0.0.1:7878 returns {timestamp_unix_ms, jobs[], system{}, queue_len,
// running_jobs, completed_jobs, failed_jobs, total_bytes_encoded}.
// The reference uses axum + sysinfo; here it is a plain socket listener and
// /proc/stat + /proc/meminfo + /proc/loadavg.
#pragma once

#include <atomic>
#include <cstdint>
#include <mutex>
#include <string>
#include <vector>

namespace av1d {

struct JobMetrics {
  std::string id;
  std::string input_path;
  std::string stage;
  double progress = 0;       // 0..1
  double fps = 0;
  double bitrate_kbps = 0;
  int crf = 0;               // qindex in the rebuild
  std::string encoder = "av1tpu";
  int workers = 0;
  double est_remaining_secs = 0;
  uint64_t frames_encoded = 0;
  uint64_t total_frames = 0;
  uint64_t size_in_bytes_before = 0;
  uint64_t size_in_bytes_after = 0;
  double vmaf = -1;   // <0 = null
  double psnr = -1;
  double ssim = -1;
};

struct SystemMetrics {
  double cpu_usage_percent = 0;
  double mem_usage_percent = 0;
  double load_avg_1 = 0, load_avg_5 = 0, load_avg_15 = 0;
};

struct MetricsSnapshot {
  int64_t timestamp_unix_ms = 0;
  std::vector<JobMetrics> jobs;
  SystemMetrics system;
  uint64_t queue_len = 0;
  uint64_t running_jobs = 0;
  uint64_t completed_jobs = 0;
  uint64_t failed_jobs = 0;
  uint64_t total_bytes_encoded = 0;
};

std::string snapshot_to_json(const MetricsSnapshot &s);

// /proc sampling (cpu usage needs two samples; the collector keeps state)
class SystemSampler {
 public:
  SystemMetrics sample();

 private:
  uint64_t last_total_ = 0, last_idle_ = 0;
};

// Thread-safe shared snapshot (reference: Arc<RwLock<MetricsSnapshot>>)
class SharedMetrics {
 public:
  MetricsSnapshot get() const {
    std::lock_guard<std::mutex> l(mu_);
    return snap_;
  }
  template <class F>
  void update(F &&f) {
    std::lock_guard<std::mutex> l(mu_);
    f(&snap_);
  }

 private:
  mutable std::mutex mu_;
  MetricsSnapshot snap_;
};

// Minimal HTTP/1.1 server: GET /metrics -> application/json snapshot;
// anything else -> 404.  Runs its own accept thread until stop().
class MetricsServer {
 public:
  MetricsServer(SharedMetrics *metrics, const std::string &bind_addr,
                int port);
  ~MetricsServer();
  bool start(std::string *err = nullptr);
  void stop();
  int port() const { return port_; }  // actual port (0 = ephemeral in ctor)

 private:
  void serve_loop();
  SharedMetrics *metrics_;
  std::string addr_;
  int port_;
  int listen_fd_ = -1;
  std::atomic<bool> running_{false};
  void *thread_ = nullptr;  // std::thread*, kept opaque in the header
};

}  // namespace av1d
