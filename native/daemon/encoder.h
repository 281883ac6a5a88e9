// Encode backend: builds and runs the TPU encoder command for a job.
//
// The reference builds an `av1an` CLI invocation (encode/av1an.rs:79-139)
// and blocks on it; here the backend is the in-repo TPU encode CLI
// (python -m av1tpu.cli encode), overridable via [tpu].encode_cmd with
// {input} {output} {qindex} {workers} placeholders — which is also how
// tests inject a fake instant encoder (SURVEY §4 recommendation).
// Hardware-encoder flags are rejected up front (startup.rs:13-15 behavior,
// actually enforced here rather than stubbed).
#pragma once

#include <string>
#include <vector>

namespace av1d {

struct EncodeParams {
  std::string input_path;
  std::string output_path;
  std::string temp_dir;
  int qindex = 72;
  int workers = 4;
};

// default template used when [tpu].encode_cmd is empty
std::string default_encode_cmd();

// expand {input} {output} {qindex} {workers} {temp} placeholders
std::string build_encode_command(const std::string &tmpl,
                                 const EncodeParams &p);

// forbidden hardware-encoder markers: nvenc qsv vaapi cuda amf vce qsvenc
bool command_has_hardware_flags(const std::string &cmd,
                                std::string *flag = nullptr);

struct EncodeResult {
  bool ok = false;
  int exit_code = -1;
  std::string error;
  // parsed from the encoder's final JSON stats line (0/absent = unknown)
  double psnr_y = 0;
  double vmaf = 0;
  double encode_fps = 0;
  int64_t frames = 0;
};

// run via popen, blocking; captures stdout and parses the trailing JSON
// stats line the av1tpu CLI prints
EncodeResult run_encode(const std::string &cmd);

}  // namespace av1d
