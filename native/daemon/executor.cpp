#include "executor.h"

#include <filesystem>

#include "encoder.h"
#include "log.h"
#include "replace.h"

namespace fs = std::filesystem;

namespace av1d {

JobExecutor::JobExecutor(const Config &cfg, const ConcurrencyPlan &plan,
                         SharedMetrics *metrics)
    : cfg_(cfg), plan_(plan), metrics_(metrics) {}

JobExecutor::~JobExecutor() { stop(); }

void JobExecutor::start() {
  std::lock_guard<std::mutex> l(mu_);
  if (!workers_.empty()) return;
  stopping_ = false;
  for (int i = 0; i < plan_.max_concurrent_jobs; i++)
    workers_.emplace_back([this] { worker_loop(); });
}

void JobExecutor::stop() {
  {
    std::lock_guard<std::mutex> l(mu_);
    stopping_ = true;
  }
  cv_.notify_all();
  for (auto &t : workers_) t.join();
  workers_.clear();
}

void JobExecutor::submit(const Job &job) {
  {
    std::lock_guard<std::mutex> l(mu_);
    queue_.push_back(job);
    metrics_->update([&](MetricsSnapshot *s) { s->queue_len = queue_.size(); });
  }
  cv_.notify_one();
}

void JobExecutor::wait_idle() {
  std::unique_lock<std::mutex> l(mu_);
  idle_cv_.wait(l, [this] { return queue_.empty() && running_jobs_ == 0; });
}

void JobExecutor::worker_loop() {
  for (;;) {
    Job job;
    {
      std::unique_lock<std::mutex> l(mu_);
      cv_.wait(l, [this] { return stopping_ || !queue_.empty(); });
      if (stopping_) return;
      job = queue_.front();
      queue_.pop_front();
      running_jobs_++;
      metrics_->update([&](MetricsSnapshot *s) {
        s->queue_len = queue_.size();
        s->running_jobs = (uint64_t)running_jobs_;
      });
    }
    execute(std::move(job));
    {
      std::lock_guard<std::mutex> l(mu_);
      running_jobs_--;
      metrics_->update([&](MetricsSnapshot *s) {
        s->running_jobs = (uint64_t)running_jobs_;
      });
    }
    idle_cv_.notify_all();
  }
}

void JobExecutor::update_job_metrics(const Job &job, const char *stage) {
  metrics_->update([&](MetricsSnapshot *s) {
    s->timestamp_unix_ms = now_ms();
    for (auto &m : s->jobs)
      if (m.id == job.id) {
        m.stage = stage;
        m.size_in_bytes_after = job.output_bytes;
        if (job.psnr_y > 0) m.psnr = job.psnr_y;
        if (job.vmaf > 0) m.vmaf = job.vmaf;
        return;
      }
    JobMetrics m;
    m.id = job.id;
    m.input_path = job.input_path;
    m.stage = stage;
    m.crf = cfg_.tpu.qindex;
    m.workers = plan_.workers_per_job;
    m.size_in_bytes_before = job.input_bytes;
    s->jobs.push_back(std::move(m));
  });
}

void JobExecutor::remove_job_metrics(const std::string &id) {
  metrics_->update([&](MetricsSnapshot *s) {
    for (size_t i = 0; i < s->jobs.size(); i++)
      if (s->jobs[i].id == id) {
        s->jobs.erase(s->jobs.begin() + i);
        return;
      }
  });
}

void JobExecutor::execute(Job job) {
  const std::string &state_dir = cfg_.paths.job_state_dir;
  auto transition = [&](JobStage st, JobStatus su) {
    job.stage = st;
    job.status = su;
    job.updated_ms = now_ms();
    save_job(job, state_dir);
    update_job_metrics(job, stage_name(st));
  };
  auto fail = [&](const std::string &why) {
    LOG_WARN("executor", "job %s failed: %s", job.id.c_str(), why.c_str());
    job.error = why;
    transition(job.stage, JobStatus::Failed);
    remove_job_metrics(job.id);
    metrics_->update([](MetricsSnapshot *s) { s->failed_jobs++; });
    failed_++;
  };

  fs::path chunks =
      fs::path(cfg_.paths.temp_output_dir) / ("chunks_" + job.id);
  std::error_code ec;
  fs::create_directories(chunks, ec);
  fs::create_directories(fs::path(job.output_path).parent_path(), ec);

  // ---- encode ----
  LOG_INFO("executor", "job %s: encoding %s (%llu bytes)", job.id.c_str(),
           job.input_path.c_str(), (unsigned long long)job.input_bytes);
  transition(JobStage::Encoding, JobStatus::Running);
  EncodeParams ep;
  ep.input_path = job.input_path;
  ep.output_path = job.output_path;
  ep.temp_dir = chunks.string();
  ep.qindex = cfg_.tpu.qindex;
  ep.workers = plan_.workers_per_job;
  std::string cmd = build_encode_command(cfg_.tpu.encode_cmd, ep);
  std::string hwflag;
  if (cfg_.encoder_safety.disallow_hardware_encoding &&
      command_has_hardware_flags(cmd, &hwflag)) {
    fail("hardware encoding flag '" + hwflag + "' in encoder command");
    fs::remove_all(chunks, ec);
    return;
  }
  EncodeResult er =
      run_encode(cmd, cfg_.tpu.encode_timeout_secs,
                 [&](const EncodeProgress &p) {
                   metrics_->update([&](MetricsSnapshot *s) {
                     for (auto &m : s->jobs)
                       if (m.id == job.id) {
                         m.progress = p.progress;
                         m.fps = p.fps;
                         m.frames_encoded = p.frames_encoded;
                         m.total_frames = p.total_frames;
                         if (p.fps > 0 && p.total_frames > p.frames_encoded)
                           m.est_remaining_secs =
                               (p.total_frames - p.frames_encoded) / p.fps;
                         return;
                       }
                   });
                 });
  if (!er.ok) {
    fail(er.error);
    fs::remove_all(chunks, ec);
    return;
  }
  job.psnr_y = er.psnr_y;  // quality stats from the encoder's JSON line
  job.vmaf = er.vmaf;

  // ---- validate ----
  transition(JobStage::Validating, JobStatus::Running);
  if (!fs::exists(job.output_path, ec) ||
      fs::file_size(job.output_path, ec) == 0) {
    fail("encoder produced no output");
    fs::remove_all(chunks, ec);
    return;
  }
  ProbeResult op;
  std::string perr;
  if (!probe_file(job.output_path, &op, &perr) || op.video_streams.empty()) {
    fail("output failed validation probe: " + perr);
    fs::remove_all(chunks, ec);
    return;
  }
  if (op.video_streams[0].codec.find("av1") == std::string::npos) {
    fail("output is not AV1 (codec=" + op.video_streams[0].codec + ")");
    fs::remove_all(chunks, ec);
    return;
  }
  job.output_bytes = fs::file_size(job.output_path, ec);

  // ---- size gate ----
  transition(JobStage::SizeGating, JobStatus::Running);
  SizeGateResult sg = check_size_gate(job.input_bytes, job.output_bytes,
                                      cfg_.gates.max_size_ratio);
  if (!sg.accepted) {
    job.error = "size gate: output " + std::to_string(sg.output_bytes) +
                " >= " + std::to_string(cfg_.gates.max_size_ratio) +
                " * original " + std::to_string(sg.original_bytes);
    transition(JobStage::SizeGating, JobStatus::Skipped);
    write_skip_marker(job.input_path);
    write_why_sidecar(job.input_path, job.error,
                      cfg_.scan.write_why_sidecars);
    fs::remove(job.output_path, ec);
    fs::remove_all(chunks, ec);
    remove_job_metrics(job.id);
    return;
  }

  // ---- replace ----
  transition(JobStage::Replacing, JobStatus::Running);
  std::string final_path, rerr;
  if (!atomic_replace(job.input_path, job.output_path,
                      cfg_.gates.keep_original, &final_path, &rerr)) {
    // preserve temp files for manual recovery (reference behavior)
    fail("replace failed (temp output kept): " + rerr);
    return;
  }

  LOG_INFO("executor", "job %s complete: %llu -> %llu bytes", job.id.c_str(),
           (unsigned long long)job.input_bytes,
           (unsigned long long)job.output_bytes);
  transition(JobStage::Complete, JobStatus::Success);
  metrics_->update([&](MetricsSnapshot *s) {
    s->completed_jobs++;
    s->total_bytes_encoded += job.output_bytes;
  });
  completed_++;
  remove_job_metrics(job.id);
  fs::remove(job.output_path, ec);
  fs::remove_all(chunks, ec);
}

}  // namespace av1d
