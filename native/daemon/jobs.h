// Persistent job store: rich Job records saved as {id}.json under the job
// state dir, reloaded each scan cycle for dedup.  Mirrors the reference
// jobs.rs (JobStage :19-32, JobStatus :57-68, Job :90-111, create/save/load
// :177-254, dedup :269-273) with one deliberate fix: the reference never
// re-saves jobs after creation (SURVEY drift #3), leaving stale "active"
// records after a restart; here every stage/status transition persists.
#pragma once

#include <cstdint>
#include <string>
#include <vector>

#include "probe.h"

namespace av1d {

enum class JobStage {
  Queued, Encoding, Validating, SizeGating, Replacing, Complete
};
enum class JobStatus { Pending, Running, Success, Failed, Skipped };

const char *stage_name(JobStage s);
const char *status_name(JobStatus s);
bool stage_from_name(const std::string &n, JobStage *out);
bool status_from_name(const std::string &n, JobStatus *out);

struct Job {
  std::string id;           // uuid v4
  std::string input_path;
  std::string output_path;  // temp_output_dir/{id}.ivf
  JobStage stage = JobStage::Queued;
  JobStatus status = JobStatus::Pending;
  SourceType source_type = SourceType::Unknown;
  ProbeResult probe;
  std::string error;        // last failure reason
  int64_t created_ms = 0;
  int64_t updated_ms = 0;
  uint64_t input_bytes = 0;
  uint64_t output_bytes = 0;
  // quality metrics, populated post-encode (never filled in the reference)
  double psnr_y = 0;
  double vmaf = 0;

  bool is_active() const {
    return status == JobStatus::Pending || status == JobStatus::Running;
  }
};

std::string generate_uuid();
int64_t now_ms();

Job create_job(const std::string &input_path, const ProbeResult &probe,
               SourceType type, const std::string &temp_output_dir);

// {job_state_dir}/{id}.json, pretty-printed
bool save_job(const Job &job, const std::string &job_state_dir);
// load all parsable {id}.json files; unparsable files are skipped
std::vector<Job> load_jobs(const std::string &job_state_dir);
bool job_exists_for_path(const std::vector<Job> &jobs,
                         const std::string &path);

std::string job_to_json(const Job &job);
bool job_from_json(const std::string &text, Job *out);

}  // namespace av1d
