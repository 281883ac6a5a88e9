#include "config.h"

#include <cstdlib>
#include <fstream>
#include <sstream>

namespace av1d {
namespace {

std::string trim(const std::string &s) {
  size_t a = s.find_first_not_of(" \t\r\n");
  if (a == std::string::npos) return "";
  size_t b = s.find_last_not_of(" \t\r\n");
  return s.substr(a, b - a + 1);
}

// strip a trailing comment that is not inside a string
std::string strip_comment(const std::string &s) {
  bool in_str = false;
  for (size_t i = 0; i < s.size(); i++) {
    if (s[i] == '"' && (i == 0 || s[i - 1] != '\\')) in_str = !in_str;
    if (s[i] == '#' && !in_str) return s.substr(0, i);
  }
  return s;
}

bool parse_string(const std::string &v, std::string *out) {
  if (v.size() < 2 || v.front() != '"' || v.back() != '"') return false;
  std::string s;
  for (size_t i = 1; i + 1 < v.size(); i++) {
    if (v[i] == '\\' && i + 2 < v.size()) {
      i++;
      switch (v[i]) {
        case 'n': s += '\n'; break;
        case 't': s += '\t'; break;
        case '"': s += '"'; break;
        case '\\': s += '\\'; break;
        default: s += v[i];
      }
    } else {
      s += v[i];
    }
  }
  *out = s;
  return true;
}

bool parse_bool(const std::string &v, bool *out) {
  if (v == "true") { *out = true; return true; }
  if (v == "false") { *out = false; return true; }
  return false;
}

bool parse_array_of_strings(const std::string &v,
                            std::vector<std::string> *out) {
  std::string t = trim(v);
  if (t.size() < 2 || t.front() != '[' || t.back() != ']') return false;
  out->clear();
  std::string inner = t.substr(1, t.size() - 2);
  size_t i = 0;
  while (i < inner.size()) {
    while (i < inner.size() && (inner[i] == ' ' || inner[i] == ',' ||
                                inner[i] == '\t' || inner[i] == '\n'))
      i++;
    if (i >= inner.size()) break;
    if (inner[i] != '"') return false;
    size_t j = i + 1;
    std::string s;
    while (j < inner.size() && inner[j] != '"') {
      if (inner[j] == '\\' && j + 1 < inner.size()) j++;
      s += inner[j];
      j++;
    }
    if (j >= inner.size()) return false;
    out->push_back(s);
    i = j + 1;
  }
  return true;
}

}  // namespace

bool Config::parse_toml(const std::string &text, std::string *err) {
  std::istringstream in(text);
  std::string line, section;
  int lineno = 0;
  // accumulate multi-line arrays
  std::string pending_key, pending_val;
  bool in_array = false;

  auto fail = [&](const std::string &msg) {
    if (err) *err = "line " + std::to_string(lineno) + ": " + msg;
    return false;
  };

  auto apply = [&](const std::string &key, const std::string &val) -> bool {
    std::string full = section.empty() ? key : section + "." + key;
    auto is = [&](const char *s) { return full == s; };
    char *e = nullptr;
    if (is("cpu.logical_cores")) cpu.logical_cores = (int)strtol(val.c_str(), &e, 10);
    else if (is("cpu.target_cpu_utilization")) cpu.target_cpu_utilization = strtod(val.c_str(), &e);
    else if (is("av1an.workers_per_job") || is("encoder.workers_per_job"))
      av1an.workers_per_job = (int)strtol(val.c_str(), &e, 10);
    else if (is("av1an.max_concurrent_jobs") || is("encoder.max_concurrent_jobs"))
      av1an.max_concurrent_jobs = (int)strtol(val.c_str(), &e, 10);
    else if (is("encoder_safety.disallow_hardware_encoding")) {
      if (!parse_bool(val, &encoder_safety.disallow_hardware_encoding))
        return fail("expected bool for " + full);
    } else if (is("paths.job_state_dir")) {
      if (!parse_string(val, &paths.job_state_dir)) return fail("expected string");
    } else if (is("paths.temp_output_dir")) {
      if (!parse_string(val, &paths.temp_output_dir)) return fail("expected string");
    } else if (is("scan.library_roots")) {
      if (!parse_array_of_strings(val, &scan.library_roots))
        return fail("expected array of strings");
    } else if (is("scan.stability_wait_secs")) scan.stability_wait_secs = strtol(val.c_str(), &e, 10);
    else if (is("scan.write_why_sidecars")) {
      if (!parse_bool(val, &scan.write_why_sidecars)) return fail("expected bool");
    } else if (is("scan.scan_interval_secs")) scan.scan_interval_secs = strtol(val.c_str(), &e, 10);
    else if (is("gates.min_bytes")) gates.min_bytes = strtoull(val.c_str(), &e, 10);
    else if (is("gates.max_size_ratio")) gates.max_size_ratio = strtod(val.c_str(), &e);
    else if (is("gates.keep_original")) {
      if (!parse_bool(val, &gates.keep_original)) return fail("expected bool");
    } else if (is("tpu.encode_cmd")) {
      if (!parse_string(val, &tpu.encode_cmd)) return fail("expected string");
    } else if (is("tpu.qindex")) tpu.qindex = (int)strtol(val.c_str(), &e, 10);
    else if (is("tpu.encode_timeout_secs"))
      tpu.encode_timeout_secs = (int)strtol(val.c_str(), &e, 10);
    // unknown keys: ignored (forward compatibility)
    if (e && e == val.c_str()) return fail("expected number for " + full);
    return true;
  };

  while (std::getline(in, line)) {
    lineno++;
    line = trim(strip_comment(line));
    if (in_array) {
      pending_val += " " + line;
      if (line.find(']') != std::string::npos) {
        in_array = false;
        if (!apply(pending_key, trim(pending_val))) return false;
      }
      continue;
    }
    if (line.empty()) continue;
    if (line.front() == '[') {
      if (line.back() != ']') return fail("malformed section header");
      section = trim(line.substr(1, line.size() - 2));
      continue;
    }
    size_t eq = line.find('=');
    if (eq == std::string::npos) return fail("expected key = value");
    std::string key = trim(line.substr(0, eq));
    std::string val = trim(line.substr(eq + 1));
    if (!val.empty() && val.front() == '[' &&
        val.find(']') == std::string::npos) {
      in_array = true;
      pending_key = key;
      pending_val = val;
      continue;
    }
    if (!apply(key, val)) return false;
  }
  if (in_array) return fail("unterminated array");
  return true;
}

void Config::apply_env_overrides() {
  if (const char *v = getenv("CPU_LOGICAL_CORES")) {
    char *e = nullptr;
    long n = strtol(v, &e, 10);
    if (e != v && *e == 0) cpu.logical_cores = (int)n;
  }
  if (const char *v = getenv("CPU_TARGET_UTILIZATION")) {
    char *e = nullptr;
    double d = strtod(v, &e);
    if (e != v && *e == 0) cpu.target_cpu_utilization = d;
  }
  if (const char *v = getenv("AV1AN_WORKERS_PER_JOB")) {
    char *e = nullptr;
    long n = strtol(v, &e, 10);
    if (e != v && *e == 0) av1an.workers_per_job = (int)n;
  }
  if (const char *v = getenv("AV1AN_MAX_CONCURRENT_JOBS")) {
    char *e = nullptr;
    long n = strtol(v, &e, 10);
    if (e != v && *e == 0) av1an.max_concurrent_jobs = (int)n;
  }
  if (const char *v = getenv("ENCODER_DISALLOW_HARDWARE_ENCODING")) {
    std::string s(v);
    for (auto &c : s) c = (char)tolower(c);
    if (s == "true" || s == "1" || s == "yes")
      encoder_safety.disallow_hardware_encoding = true;
    else if (s == "false" || s == "0" || s == "no")
      encoder_safety.disallow_hardware_encoding = false;
  }
}

bool Config::load(const std::string &path, Config *out, std::string *err) {
  std::ifstream f(path);
  if (!f) {
    if (err) *err = "cannot read " + path;
    return false;
  }
  std::stringstream ss;
  ss << f.rdbuf();
  if (!out->parse_toml(ss.str(), err)) return false;
  out->apply_env_overrides();
  return true;
}

}  // namespace av1d
