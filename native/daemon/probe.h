// Media probing + admission gates + source classification.
//
// The reference shells out to ffprobe (gates.rs:133-157) and parses its JSON;
// this rebuild probes in-process with libavformat (no subprocess), producing
// the same ProbeResult shape, and applies the same three gates
// (gates.rs:232-261): no video streams / below minimum size / already AV1.
// Classification mirrors classify.rs:41-131 (path keywords, then
// bitrate-per-megapixel threshold).
#pragma once

#include <cstdint>
#include <string>
#include <vector>

namespace av1d {

struct VideoStream {
  std::string codec;
  int width = 0;
  int height = 0;
  double bitrate_kbps = 0;  // 0 = unknown
};

struct AudioStream {
  std::string codec;
};

struct FormatInfo {
  double duration_secs = 0;
  uint64_t size_bytes = 0;
  std::string container;
};

struct ProbeResult {
  std::vector<VideoStream> video_streams;
  std::vector<AudioStream> audio_streams;
  FormatInfo format;
};

// libavformat probe.  Returns false + err on open/parse failure.
bool probe_file(const std::string &path, ProbeResult *out,
                std::string *err = nullptr);

struct GateResult {
  bool proceed = false;
  std::string reason;  // set when skipped
};

GateResult check_gates(const ProbeResult &probe, uint64_t min_bytes);

enum class SourceType { WebLike, DiscLike, Unknown };
const char *source_type_name(SourceType t);

SourceType classify_source(const std::string &path, const ProbeResult &probe);
SourceType classify_by_bitrate_ratio(const ProbeResult &probe);

}  // namespace av1d
