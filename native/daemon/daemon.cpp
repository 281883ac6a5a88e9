#include "daemon.h"

#include <chrono>
#include <cstdio>
#include <filesystem>

#include "encoder.h"
#include "log.h"

namespace fs = std::filesystem;

namespace av1d {

Daemon::~Daemon() { stop(); }

bool Daemon::init(const DaemonOptions &opts, std::string *err) {
  opts_ = opts;
  if (!Config::load(opts.config_path, &cfg_, err)) return false;
  if (!opts.temp_dir.empty()) cfg_.paths.temp_output_dir = opts.temp_dir;
  if (!opts.skip_checks && !preflight(err)) return false;

  std::error_code ec;
  fs::create_directories(cfg_.paths.job_state_dir, ec);
  fs::create_directories(cfg_.paths.temp_output_dir, ec);
  if (ec) {
    if (err) *err = "cannot create state/temp directories: " + ec.message();
    return false;
  }

  plan_ = derive_plan(cfg_.cpu.logical_cores, cfg_.cpu.target_cpu_utilization,
                      cfg_.av1an.workers_per_job,
                      cfg_.av1an.max_concurrent_jobs);
  executor_ = std::make_unique<JobExecutor>(cfg_, plan_, &metrics_);
  executor_->start();
  server_ = std::make_unique<MetricsServer>(&metrics_, "127.0.0.1",
                                            opts.metrics_port);
  return true;
}

bool Daemon::preflight(std::string *err) {
  // software-only assertion on the actual encoder command (the reference's
  // assert_software_only scans an empty list — stub; here it is enforced)
  EncodeParams probe_params;
  probe_params.input_path = "in";
  probe_params.output_path = "out";
  std::string cmd = build_encode_command(cfg_.tpu.encode_cmd, probe_params);
  std::string flag;
  if (cfg_.encoder_safety.disallow_hardware_encoding &&
      command_has_hardware_flags(cmd, &flag)) {
    if (err) *err = "encoder command contains hardware flag '" + flag + "'";
    return false;
  }
  return true;
}

int Daemon::run_scan_cycle() {
  std::vector<Job> existing = load_jobs(cfg_.paths.job_state_dir);
  std::vector<ScanCandidate> candidates =
      scan_libraries(cfg_.scan.library_roots);
  int enqueued = 0;
  for (const auto &cand : candidates) {
    if (stopping_) break;
    if (job_exists_for_path(existing, cand.path)) continue;

    StabilityResult st =
        check_stability(cand.path, cfg_.scan.stability_wait_secs);
    if (!st.stable) continue;  // re-checked next cycle

    ProbeResult probe;
    std::string perr;
    if (!probe_file(cand.path, &probe, &perr)) {
      write_skip_marker(cand.path);
      write_why_sidecar(cand.path, "probe failed: " + perr,
                        cfg_.scan.write_why_sidecars);
      continue;
    }
    GateResult gate = check_gates(probe, cfg_.gates.min_bytes);
    if (!gate.proceed) {
      write_skip_marker(cand.path);
      write_why_sidecar(cand.path, gate.reason, cfg_.scan.write_why_sidecars);
      continue;
    }
    SourceType type = classify_source(cand.path, probe);
    Job job = create_job(cand.path, probe, type,
                         cfg_.paths.temp_output_dir);
    save_job(job, cfg_.paths.job_state_dir);
    executor_->submit(job);
    existing.push_back(job);
    enqueued++;
  }
  return enqueued;
}

void Daemon::run_with_scanning() {
  std::string serr;
  if (!server_->start(&serr))
    LOG_ERROR("metrics", "server failed to start: %s", serr.c_str());

  tasks_.emplace_back([this] {  // 500 ms system sampler
    while (!stopping_) {
      SystemMetrics sm = sampler_.sample();
      metrics_.update([&](MetricsSnapshot *s) {
        s->system = sm;
        s->timestamp_unix_ms = now_ms();
      });
      std::this_thread::sleep_for(std::chrono::milliseconds(500));
    }
  });
  tasks_.emplace_back([this] {  // periodic scan cycle
    while (!stopping_) {
      int n = run_scan_cycle();
      if (n) printf("scan cycle enqueued %d job(s)\n", n);
      LOG_INFO("scan", "cycle complete: %d job(s) enqueued", n);
      for (int64_t i = 0; i < cfg_.scan.scan_interval_secs * 10 && !stopping_;
           i++)
        std::this_thread::sleep_for(std::chrono::milliseconds(100));
    }
  });
  // block until stopped
  while (!stopping_)
    std::this_thread::sleep_for(std::chrono::milliseconds(200));
  for (auto &t : tasks_) t.join();
  tasks_.clear();
}

void Daemon::run_once() {
  std::string serr;
  if (server_ && !server_->start(&serr))
    LOG_ERROR("metrics", "server failed to start: %s", serr.c_str());
  metrics_.update([&](MetricsSnapshot *s) {
    s->system = sampler_.sample();
    s->timestamp_unix_ms = now_ms();
  });
  int n = run_scan_cycle();
  printf("scan cycle enqueued %d job(s)\n", n);
  executor_->wait_idle();
}

void Daemon::stop() {
  stopping_ = true;
  for (auto &t : tasks_) t.join();
  tasks_.clear();
  if (executor_) executor_->stop();
  if (server_) server_->stop();
}

int Daemon::metrics_port() const { return server_ ? server_->port() : 0; }

}  // namespace av1d
