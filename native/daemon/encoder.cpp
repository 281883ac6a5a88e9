#include "encoder.h"

#include <algorithm>
#include <cstdlib>

namespace av1d {

std::string default_encode_cmd() {
  return "python3 -m av1tpu.cli encode -i {input} -o {output} "
         "--qindex {qindex} --workers {workers}";
}

static std::string shell_quote(const std::string &s) {
  std::string out = "'";
  for (char c : s) {
    if (c == '\'') out += "'\\''";
    else out += c;
  }
  out += "'";
  return out;
}

std::string build_encode_command(const std::string &tmpl,
                                 const EncodeParams &p) {
  std::string t = tmpl.empty() ? default_encode_cmd() : tmpl;
  auto sub = [&](const std::string &key, const std::string &val) {
    size_t pos;
    while ((pos = t.find(key)) != std::string::npos)
      t.replace(pos, key.size(), val);
  };
  sub("{input}", shell_quote(p.input_path));
  sub("{output}", shell_quote(p.output_path));
  sub("{temp}", shell_quote(p.temp_dir));
  sub("{qindex}", std::to_string(p.qindex));
  sub("{workers}", std::to_string(p.workers));
  return t;
}

bool command_has_hardware_flags(const std::string &cmd, std::string *flag) {
  static const char *kForbidden[] = {"nvenc", "qsv", "vaapi", "cuda",
                                     "amf", "vce", "qsvenc"};
  std::string low = cmd;
  std::transform(low.begin(), low.end(), low.begin(),
                 [](unsigned char c) { return (char)tolower(c); });
  for (const char *f : kForbidden)
    if (low.find(f) != std::string::npos) {
      if (flag) *flag = f;
      return true;
    }
  return false;
}

EncodeResult run_encode(const std::string &cmd) {
  EncodeResult r;
  int rc = system(cmd.c_str());
  if (rc < 0) {
    r.error = "failed to spawn encoder";
    return r;
  }
  r.exit_code = rc >> 8;
  if (rc & 0x7F) {  // killed by signal
    r.error = "encoder terminated by signal " + std::to_string(rc & 0x7F);
    return r;
  }
  if (r.exit_code != 0) {
    r.error = "encoder exited with status " + std::to_string(r.exit_code);
    return r;
  }
  r.ok = true;
  return r;
}

}  // namespace av1d
