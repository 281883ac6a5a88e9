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

#include <cstdint>
#include <functional>
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

// live progress event, parsed from per-chunk JSON lines the av1tpu CLI
// prints (any stdout line that is a JSON object with a "progress" key);
// fixes reference drift #5 where Progress/FPS/ETA never moved
// (reference job_executor.rs:117-137 hardcodes them to 0)
struct EncodeProgress {
  double progress = 0;  // 0..1
  uint64_t frames_encoded = 0;
  uint64_t total_frames = 0;
  double fps = 0;
};
using ProgressFn = std::function<void(const EncodeProgress &)>;

// Runs the encoder in its own process group, streaming stdout line by line:
// JSON lines with a "progress" key fire on_progress as they arrive; the
// last other JSON object line is the final stats record.  timeout_secs > 0
// kills the whole process group when exceeded (stuck-encoder recovery —
// the hole SURVEY §5 flags in the reference).
EncodeResult run_encode(const std::string &cmd, int timeout_secs = 0,
                        const ProgressFn &on_progress = nullptr);

}  // namespace av1d
