// Job executor: a fixed pool of worker threads draining a job queue, each
// job run through the encode -> validate -> size-gate -> replace pipeline
// with metrics updates and persistent state transitions at every step.
//
// Mirrors job_executor.rs (semaphore-gated execute :266-437, metrics
// transitions :440-485, failure isolation) with two deliberate fixes over
// the reference: job JSON is re-saved on every transition (drift #3) and
// validation actually decodes the output header instead of only checking
// non-emptiness (encoding_flow drift #1).
#pragma once

#include <condition_variable>
#include <deque>
#include <mutex>
#include <thread>
#include <vector>

#include "config.h"
#include "jobs.h"
#include "metrics.h"
#include "scan.h"

namespace av1d {

class JobExecutor {
 public:
  JobExecutor(const Config &cfg, const ConcurrencyPlan &plan,
              SharedMetrics *metrics);
  ~JobExecutor();

  void start();
  void stop();                 // drain-free stop: finish in-flight, drop queued
  void submit(const Job &job);
  void wait_idle();            // block until queue empty and no job running

  uint64_t completed() const { return completed_; }
  uint64_t failed() const { return failed_; }

  // single-job pipeline, exposed for tests / --once mode
  void execute(Job job);

 private:
  void worker_loop();
  void update_job_metrics(const Job &job, const char *stage);
  void remove_job_metrics(const std::string &id);

  Config cfg_;
  ConcurrencyPlan plan_;
  SharedMetrics *metrics_;
  std::deque<Job> queue_;
  std::mutex mu_;
  std::condition_variable cv_, idle_cv_;
  std::vector<std::thread> workers_;
  int running_jobs_ = 0;
  bool stopping_ = false;
  std::atomic<uint64_t> completed_{0}, failed_{0};
};

}  // namespace av1d
