// Daemon orchestrator: init sequence, scan cycle, metrics updater, job loop.
// Mirrors daemon.rs (init :113-150, background tasks :235-261, scan cycle
// :465-587, run_with_scanning :606-618) with one scan-cycle implementation
// instead of the reference's duplicated pair (drift #8).
#pragma once

#include <atomic>
#include <string>
#include <thread>
#include <vector>

#include "config.h"
#include "executor.h"
#include "jobs.h"
#include "metrics.h"
#include "scan.h"

namespace av1d {

struct DaemonOptions {
  std::string config_path = "config.toml";
  std::string temp_dir;     // override paths.temp_output_dir if nonempty
  bool skip_checks = false;
  int metrics_port = 7878;  // 0 = ephemeral (tests)
};

class Daemon {
 public:
  ~Daemon();

  // load config, preflight, create dirs, derive plan.  Returns false + err.
  bool init(const DaemonOptions &opts, std::string *err);

  // One scan cycle: load jobs, scan libraries, gate/classify candidates,
  // create + enqueue jobs.  Returns number of jobs enqueued.
  int run_scan_cycle();

  // Start background threads (metrics server + sampler + periodic scans)
  // and block until stop() is called from another thread / signal handler.
  void run_with_scanning();

  // Run one scan cycle, drain the queue, exit (for tests and cron use).
  void run_once();

  void stop();
  // async-signal-safe: flags the main/scan loops to wind down; the actual
  // joins happen on the normal control path (signal handlers must not join)
  void request_stop() { stopping_ = true; }

  const ConcurrencyPlan &plan() const { return plan_; }
  const Config &config() const { return cfg_; }
  SharedMetrics *metrics() { return &metrics_; }
  int metrics_port() const;

 private:
  bool preflight(std::string *err);

  Config cfg_;
  DaemonOptions opts_;
  ConcurrencyPlan plan_;
  SharedMetrics metrics_;
  SystemSampler sampler_;
  std::unique_ptr<JobExecutor> executor_;
  std::unique_ptr<MetricsServer> server_;
  std::vector<std::thread> tasks_;
  std::atomic<bool> stopping_{false};
};

}  // namespace av1d
