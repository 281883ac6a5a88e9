#include "encoder.h"

#include <algorithm>
#include <cstdio>
#include <cstdlib>

#include "json.h"

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
  FILE *p = popen(cmd.c_str(), "r");
  if (!p) {
    r.error = "failed to spawn encoder";
    return r;
  }
  std::string out;
  char buf[4096];
  size_t n;
  while ((n = fread(buf, 1, sizeof buf, p)) > 0) out.append(buf, n);
  int rc = pclose(p);
  r.exit_code = rc >= 0 ? (rc >> 8) : -1;
  if (rc < 0 || (rc & 0x7F)) {
    r.error = "encoder terminated abnormally";
    return r;
  }
  if (r.exit_code != 0) {
    r.error = "encoder exited with status " + std::to_string(r.exit_code);
    return r;
  }
  // last nonempty line should be the JSON stats record
  size_t end = out.find_last_not_of("\r\n ");
  if (end != std::string::npos) {
    size_t start = out.find_last_of('\n', end);
    start = start == std::string::npos ? 0 : start + 1;
    bool ok = false;
    JsonPtr j = Json::parse(out.substr(start, end - start + 1), &ok);
    if (ok && j && j->type == Json::OBJ) {
      if (auto v = j->get("psnr_y")) r.psnr_y = v->as_num();
      if (auto v = j->get("vmaf")) r.vmaf = v->as_num();
      if (auto v = j->get("encode_fps")) r.encode_fps = v->as_num();
      if (auto v = j->get("frames")) r.frames = (int64_t)v->as_num();
    }
  }
  r.ok = true;
  return r;
}

}  // namespace av1d
