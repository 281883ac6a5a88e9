#include "jobs.h"

#include <chrono>
#include <filesystem>
#include <fstream>
#include <random>
#include <sstream>

#include "json.h"

namespace fs = std::filesystem;

namespace av1d {

const char *stage_name(JobStage s) {
  switch (s) {
    case JobStage::Queued: return "queued";
    case JobStage::Encoding: return "encoding";
    case JobStage::Validating: return "validating";
    case JobStage::SizeGating: return "size_gating";
    case JobStage::Replacing: return "replacing";
    case JobStage::Complete: return "complete";
  }
  return "queued";
}

const char *status_name(JobStatus s) {
  switch (s) {
    case JobStatus::Pending: return "pending";
    case JobStatus::Running: return "running";
    case JobStatus::Success: return "success";
    case JobStatus::Failed: return "failed";
    case JobStatus::Skipped: return "skipped";
  }
  return "pending";
}

bool stage_from_name(const std::string &n, JobStage *out) {
  for (JobStage s : {JobStage::Queued, JobStage::Encoding,
                     JobStage::Validating, JobStage::SizeGating,
                     JobStage::Replacing, JobStage::Complete})
    if (n == stage_name(s)) { *out = s; return true; }
  return false;
}

bool status_from_name(const std::string &n, JobStatus *out) {
  for (JobStatus s : {JobStatus::Pending, JobStatus::Running,
                      JobStatus::Success, JobStatus::Failed,
                      JobStatus::Skipped})
    if (n == status_name(s)) { *out = s; return true; }
  return false;
}

std::string generate_uuid() {
  static thread_local std::mt19937_64 rng(
      std::random_device{}() ^
      (uint64_t)std::chrono::steady_clock::now().time_since_epoch().count());
  uint64_t a = rng(), b = rng();
  a = (a & ~0xF000ULL) | 0x4000ULL;                 // version 4
  b = (b & ~(0xC0ULL << 56)) | (0x80ULL << 56);     // variant 10
  char buf[40];
  snprintf(buf, sizeof buf,
           "%08x-%04x-%04x-%04x-%012llx",
           (uint32_t)(a >> 32), (uint32_t)(a >> 16) & 0xFFFF,
           (uint32_t)a & 0xFFFF, (uint32_t)(b >> 48) & 0xFFFF,
           (unsigned long long)(b & 0xFFFFFFFFFFFFULL));
  return buf;
}

int64_t now_ms() {
  return std::chrono::duration_cast<std::chrono::milliseconds>(
             std::chrono::system_clock::now().time_since_epoch()).count();
}

Job create_job(const std::string &input_path, const ProbeResult &probe,
               SourceType type, const std::string &temp_output_dir) {
  Job j;
  j.id = generate_uuid();
  j.input_path = input_path;
  // .mkv: the encode backend muxes the original's audio/subtitle streams
  // into the output container (reference jobs.rs:187-188 also emits .mkv)
  j.output_path = (fs::path(temp_output_dir) / (j.id + ".mkv")).string();
  j.probe = probe;
  j.source_type = type;
  j.input_bytes = probe.format.size_bytes;
  j.created_ms = j.updated_ms = now_ms();
  return j;
}

static JsonPtr probe_to_json(const ProbeResult &p) {
  auto j = Json::object();
  auto vs = Json::array();
  for (const auto &v : p.video_streams) {
    auto o = Json::object();
    o->set("codec", Json::string(v.codec));
    o->set("width", Json::number(v.width));
    o->set("height", Json::number(v.height));
    o->set("bitrate_kbps", Json::number(v.bitrate_kbps));
    vs->arr.push_back(o);
  }
  j->set("video_streams", vs);
  auto as = Json::array();
  for (const auto &a : p.audio_streams) {
    auto o = Json::object();
    o->set("codec", Json::string(a.codec));
    as->arr.push_back(o);
  }
  j->set("audio_streams", as);
  auto f = Json::object();
  f->set("duration_secs", Json::number(p.format.duration_secs));
  f->set("size_bytes", Json::number((double)p.format.size_bytes));
  f->set("container", Json::string(p.format.container));
  j->set("format", f);
  return j;
}

static void probe_from_json(const JsonPtr &j, ProbeResult *p) {
  if (!j || j->type != Json::OBJ) return;
  if (auto vs = j->get("video_streams"); vs && vs->type == Json::ARR)
    for (auto &o : vs->arr) {
      VideoStream v;
      v.codec = o->get("codec") ? o->get("codec")->as_str() : "";
      v.width = o->get("width") ? (int)o->get("width")->as_int() : 0;
      v.height = o->get("height") ? (int)o->get("height")->as_int() : 0;
      v.bitrate_kbps =
          o->get("bitrate_kbps") ? o->get("bitrate_kbps")->as_num() : 0;
      p->video_streams.push_back(std::move(v));
    }
  if (auto as = j->get("audio_streams"); as && as->type == Json::ARR)
    for (auto &o : as->arr) {
      AudioStream a;
      a.codec = o->get("codec") ? o->get("codec")->as_str() : "";
      p->audio_streams.push_back(std::move(a));
    }
  if (auto f = j->get("format"); f && f->type == Json::OBJ) {
    if (auto d = f->get("duration_secs")) p->format.duration_secs = d->as_num();
    if (auto s = f->get("size_bytes"))
      p->format.size_bytes = (uint64_t)s->as_num();
    if (auto c = f->get("container")) p->format.container = c->as_str();
  }
}

std::string job_to_json(const Job &job) {
  auto j = Json::object();
  j->set("id", Json::string(job.id));
  j->set("input_path", Json::string(job.input_path));
  j->set("output_path", Json::string(job.output_path));
  j->set("stage", Json::string(stage_name(job.stage)));
  j->set("status", Json::string(status_name(job.status)));
  j->set("source_type", Json::string(source_type_name(job.source_type)));
  j->set("probe", probe_to_json(job.probe));
  j->set("error", Json::string(job.error));
  j->set("created_ms", Json::number((double)job.created_ms));
  j->set("updated_ms", Json::number((double)job.updated_ms));
  j->set("input_bytes", Json::number((double)job.input_bytes));
  j->set("output_bytes", Json::number((double)job.output_bytes));
  j->set("psnr_y", Json::number(job.psnr_y));
  j->set("tpu_vmaf", Json::number(job.vmaf));
  return j->dumps(2);
}

bool job_from_json(const std::string &text, Job *out) {
  bool ok = false;
  JsonPtr j = Json::parse(text, &ok);
  if (!ok || !j || j->type != Json::OBJ) return false;
  if (!j->has("id") || !j->has("input_path")) return false;
  out->id = j->get("id")->as_str();
  out->input_path = j->get("input_path")->as_str();
  if (auto v = j->get("output_path")) out->output_path = v->as_str();
  JobStage st;
  if (auto v = j->get("stage"); v && stage_from_name(v->as_str(), &st))
    out->stage = st;
  JobStatus su;
  if (auto v = j->get("status"); v && status_from_name(v->as_str(), &su))
    out->status = su;
  if (auto v = j->get("source_type")) {
    std::string s = v->as_str();
    out->source_type = s == "web-like" ? SourceType::WebLike
                       : s == "disc-like" ? SourceType::DiscLike
                                          : SourceType::Unknown;
  }
  probe_from_json(j->get("probe"), &out->probe);
  if (auto v = j->get("error")) out->error = v->as_str();
  if (auto v = j->get("created_ms")) out->created_ms = (int64_t)v->as_num();
  if (auto v = j->get("updated_ms")) out->updated_ms = (int64_t)v->as_num();
  if (auto v = j->get("input_bytes")) out->input_bytes = (uint64_t)v->as_num();
  if (auto v = j->get("output_bytes"))
    out->output_bytes = (uint64_t)v->as_num();
  if (auto v = j->get("psnr_y")) out->psnr_y = v->as_num();
  if (auto v = j->get("tpu_vmaf")) out->vmaf = v->as_num();
  return true;
}

bool save_job(const Job &job, const std::string &job_state_dir) {
  std::error_code ec;
  fs::create_directories(job_state_dir, ec);
  fs::path p = fs::path(job_state_dir) / (job.id + ".json");
  // write-then-rename for crash safety
  fs::path tmp = p;
  tmp += ".tmp";
  {
    std::ofstream f(tmp);
    if (!f) return false;
    f << job_to_json(job) << "\n";
    if (!f) return false;
  }
  fs::rename(tmp, p, ec);
  return !ec;
}

std::vector<Job> load_jobs(const std::string &job_state_dir) {
  std::vector<Job> jobs;
  std::error_code ec;
  for (auto it = fs::directory_iterator(job_state_dir, ec);
       !ec && it != fs::directory_iterator(); it.increment(ec)) {
    if (it->path().extension() != ".json") continue;
    std::ifstream f(it->path());
    if (!f) continue;
    std::stringstream ss;
    ss << f.rdbuf();
    Job j;
    if (job_from_json(ss.str(), &j)) jobs.push_back(std::move(j));
  }
  return jobs;
}

bool job_exists_for_path(const std::vector<Job> &jobs,
                         const std::string &path) {
  for (const auto &j : jobs)
    if (j.input_path == path && j.is_active()) return true;
  return false;
}

}  // namespace av1d
